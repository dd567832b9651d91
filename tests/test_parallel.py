"""Row-sharded multi-chip rendering on a virtual 8-device CPU mesh.

Validates the SPMD design (piet_tpu/parallel/sharding.py): scene
replicated, tile rows sharded, no cross-device coupling -- the sharded
image must match the CPU golden within the same XLA:CPU FMA tolerance as
the single-chip tests (tests/test_fine.py), and per-device capacity
diagnostics must report cleanly.
"""

import numpy as np
import pytest

import jax

from piet_tpu.config import RenderConfig
from piet_tpu.parallel import ShardedRenderer
from piet_tpu.raster.cpu_fine import cpu_render_scene
from piet_tpu.renderer.renderer import Renderer
from piet_tpu.scene.fixtures import make_cardioid
from piet_tpu.scene.svg import make_tiger

CFG = RenderConfig(width=512, height=512, tile_height=16, tile_width=16,
                   cmd_capacity=128, max_items=256, max_points=1024,
                   max_segments=1024, max_hits=1 << 15,
                   max_candidates=1 << 12, max_deltas=1 << 11)


def _mesh(n=8):
    devs = jax.devices("cpu")
    if len(devs) < n:
        pytest.skip(f"need {n} virtual cpu devices")
    return jax.sharding.Mesh(np.array(devs[:n]), ("y",))


def _assert_near(img, gold):
    diff = np.abs(img.astype(np.int32) - gold.astype(np.int32))
    assert diff.max() <= 2, f"maxdiff {diff.max()}"
    assert (diff.max(-1) > 0).mean() < 1e-4


def test_sharded_matches_golden_cardioid():
    mesh = _mesh()
    scene = make_cardioid(center=(256.0, 256.0), r=200.0)
    r = ShardedRenderer(CFG, mesh, fine_impl="xla")
    img = r.render(scene)
    gold = cpu_render_scene(scene, CFG)
    _assert_near(img, gold)
    assert all(int(v.sum()) == 0 for k, v in r.last_stats.items()
               if k.endswith("overflow"))


def test_sharded_matches_golden_tiger():
    mesh = _mesh()
    cfg = RenderConfig(width=224, height=256, tile_height=16, tile_width=16,
                       cmd_capacity=768, max_items=512, max_points=1 << 15,
                       max_segments=1 << 15, max_hits=1 << 16,
                       max_candidates=1 << 13, max_deltas=1 << 13)
    scene = make_tiger(scale=1.0)
    r = ShardedRenderer(cfg, mesh, fine_impl="xla")
    img = r.render(scene)
    gold = cpu_render_scene(scene, cfg)
    _assert_near(img, gold)


def test_sharded_matches_unsharded_counts():
    """Coarse metadata (counts/solid per tile) must agree exactly between
    the sharded and single-chip paths -- binning is integer-exact."""
    mesh = _mesh()
    scene = make_cardioid(center=(256.0, 256.0), r=200.0)
    sharded = ShardedRenderer(CFG, mesh, fine_impl="xla")
    # Capacity limits are per shard; the single-chip run needs the whole
    # viewport's records in one budget.
    import dataclasses
    single = Renderer(dataclasses.replace(CFG, max_hits=1 << 18,
                                          max_candidates=1 << 14,
                                          max_deltas=1 << 13),
                      fine_impl="xla")
    img_s = sharded.render(scene)
    img_u = single.render(scene)
    assert int(sharded.last_stats["max_tile_cmds"].max()) == \
        int(single.last_stats["max_tile_cmds"])
    diff = np.abs(img_s.astype(np.int32) - img_u.astype(np.int32))
    assert diff.max() <= 2
    assert (diff.max(-1) > 0).mean() < 1e-4


def test_interleaved_partition_matches_contiguous():
    """The load-balanced strided-block partition (interleave=B) must
    produce the same image as the contiguous-slab partition: the pipeline
    is row-local, so the slab decomposition cannot change any tile's
    commands (pixel tolerance = the usual XLA:CPU FMA allowance; shapes
    differ per slab, so contraction choices may too)."""
    mesh = _mesh()
    scene = make_cardioid(center=(256.0, 256.0), r=200.0)
    contiguous = ShardedRenderer(CFG, mesh, fine_impl="xla")
    balanced = ShardedRenderer(CFG, mesh, fine_impl="xla", interleave=2)
    img_c = contiguous.render(scene)
    img_b = balanced.render(scene)
    _assert_near(img_b, img_c)
    # Integer coarse diagnostics agree exactly.
    assert int(balanced.last_stats["max_tile_cmds"].max()) == \
        int(contiguous.last_stats["max_tile_cmds"].max())
    assert all(int(v.sum()) == 0 for k, v in balanced.last_stats.items()
               if k.endswith("overflow"))
