"""Fused hit-record kernel (ops/hitfuse.py) vs the staged XLA pipeline.

The fused kernel replaces four materialized coarse stages; its contract
is BITWISE equality of the full CoarseEntries output (stream, ranges,
counts, solid) with the staged path on every scene class: plain tiger
geometry, clips/layers/gradients (whose extension commands ride the
candidate side but whose backdrops depend on fused cand_emit windows),
and multi-subpath fills.  Runs the kernel in Mosaic interpret mode on
CPU; the on-chip twin is tests/test_tpu_exact.py + tools/onchip_r3.log.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.smoke

jax = pytest.importorskip("jax")

from piet_tpu.config import RenderConfig              # noqa: E402
from piet_tpu.ops.coarse import coarse_rasterize     # noqa: E402
from piet_tpu.renderer.capacity import fit_capacities  # noqa: E402
from piet_tpu.renderer.renderer import prepare_scene  # noqa: E402
from piet_tpu.scene import fixtures                   # noqa: E402
from piet_tpu.scene.svg import make_tiger             # noqa: E402

LEAVES = ("stream", "first", "n_entries", "counts", "solid")


def _entries(scene, w, h, hitfuse, pair="off"):
    cfg = fit_capacities(scene, RenderConfig(
        width=w, height=h, tile_height=16, tile_width=128,
        cmd_capacity=512))
    dev = prepare_scene(scene, cfg)
    return coarse_rasterize(
        dev, tiles_x=cfg.tiles_x, tiles_y=cfg.tiles_y,
        tile_w=cfg.tile_width, tile_h=cfg.tile_height,
        cmd_capacity=cfg.cmd_capacity, max_segments=cfg.max_segments,
        max_hits=cfg.max_hits, max_candidates=cfg.max_candidates,
        max_deltas=cfg.max_deltas, output="entries", sort_impl="xla",
        pair=pair, hitfuse=hitfuse)


def _assert_bitwise_equal(a, b):
    for name in LEAVES:
        x = np.asarray(getattr(a, name))
        y = np.asarray(getattr(b, name))
        np.testing.assert_array_equal(
            x.view(np.uint32) if x.dtype.kind == "f" else x,
            y.view(np.uint32) if y.dtype.kind == "f" else y,
            err_msg=name)


@pytest.mark.parametrize("name,make,wh", [
    ("tiger", lambda: make_tiger(scale=1.0), (512, 512)),
    ("clips", lambda: fixtures.get_scene("animated"), (512, 512)),
    ("holes", lambda: fixtures.get_scene("holes"), (256, 256)),
])
def test_fused_bit_identical_entries(name, make, wh):
    scene = make()
    ref = _entries(scene, *wh, hitfuse="off")
    got = _entries(scene, *wh, hitfuse="pallas_interpret")
    _assert_bitwise_equal(ref, got)


def test_fused_bit_identical_paired_stream():
    # Pairing consumes the fused rows/keys downstream; cover the compact
    # path once.
    scene = make_tiger(scale=1.0)
    ref = _entries(scene, 512, 512, hitfuse="off", pair="compact")
    got = _entries(scene, 512, 512, hitfuse="pallas_interpret",
                   pair="compact")
    _assert_bitwise_equal(ref, got)
