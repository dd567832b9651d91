"""Shared image-comparison policy for CPU-host pipeline tests.

Full-pipeline tests (device coarse + fine vs the numpy/C++ oracle) run
on CPU by the conftest contract; XLA:CPU's LLVM backend contracts
mul+add chains into FMAs inside large fusion contexts (neither
optimization_barrier nor bitcast chains survive), double-rounding a tiny
fraction of pixels by one u8 code.  The shared math itself is verified
bitwise against the numpy mirror when jitted stand-alone
(tests/test_divdet.py; tests/test_fine.py notes), and on TPU hardware --
where Mosaic and XLA:TPU never contract -- the same comparisons are
strict equality (tests/test_tpu_exact.py).
"""

import numpy as np

#: Max fraction of PIXELS allowed off on CPU (loose at wide tiles:
#: contraction on a per-row intermediate perturbs 128 pixels at once).
CPU_FMA_FRAC = 1e-3


def assert_images_match(img, gold, err_msg=""):
    """assert_array_equal up to the documented XLA:CPU FMA artifact:
    at most 2 codes (two contracted chains can compound) on a small
    fraction of pixels."""
    img = np.asarray(img)
    gold = np.asarray(gold)
    assert img.shape == gold.shape, (img.shape, gold.shape)
    diff = np.abs(img.astype(np.int32) - gold.astype(np.int32))
    if not (diff > 0).any():
        return
    assert diff.max() <= 2, f"{err_msg} max code diff {diff.max()}"
    frac = (diff.max(-1) > 0).mean()
    assert frac <= CPU_FMA_FRAC, (
        f"{err_msg} {frac:.4%} of pixels differ "
        f"(XLA:CPU FMA tolerance is {CPU_FMA_FRAC:.1%})")
