"""Golden pin of the entry-stream word map (layout/entry_stream.py).

The coarse pass writes these words and the Pallas fine kernel reads them;
both import the constants from one module.  This test freezes the map so
any relayout is a DELIBERATE, reviewed change (the wire-format analog is
tests/test_scene.py's byte goldens).
"""

from piet_tpu.layout import entry_stream as es


def test_entry_stream_word_map():
    assert es.ENTRY_WORDS == 16
    assert es.W_S0_TAG == 0
    assert es.W_S0_ARG == 1 and es.N_S0_ARGS == 7
    assert es.W_S1_TAG == 8
    assert es.W_S1_ARG == 9 and es.N_S1_ARGS == 5
    assert es.W_BAIL == 13
    assert es.W_META == 14
    assert es.W_PAD == 15
    assert es.META_NCMDS_MASK == 3
    assert es.META_OPAQUE_BIT == 4
    assert es.META_CLEAR_BIT == 8


def test_entry_stream_coarse_agrees():
    """The coarse pass's stream block shape rides on ENTRY_WORDS."""
    import inspect

    from piet_tpu.ops import coarse, fine

    assert "entry_stream" in inspect.getsource(coarse)
    assert "entry_stream" in inspect.getsource(fine)
