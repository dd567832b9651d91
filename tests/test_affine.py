"""Device-side affine animation (scene/affine.py): arbitrary scenes
under per-item affines with NO host encode.

Pins (1) the identity transform is geometry-preserving, (2) the RENDER
of a device-transformed frame matches the CPU oracle fed the
device-computed arrays (the scene/animate.py exactness contract),
(3) gradient/clip remapping stays consistent end to end, (4) the
rotation helper's matrix algebra."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from piet_tpu.config import RenderConfig                 # noqa: E402
from piet_tpu.renderer.capacity import fit_capacities    # noqa: E402
from piet_tpu.renderer.renderer import (Renderer,        # noqa: E402
                                        prepare_scene)
from piet_tpu.raster.cpu_fine import cpu_render_scene    # noqa: E402
from piet_tpu.scene import affine                        # noqa: E402
from piet_tpu.scene.scene import Scene, SceneBuilder     # noqa: E402
from piet_tpu.scene.fixtures import get_scene            # noqa: E402
from tests._imgcmp import assert_images_match            # noqa: E402

SIZE = 256


def _fetch_scene(dev, tmpl):
    n, npts = tmpl.n_items, tmpl.n_points
    return Scene(
        tags=np.asarray(dev.tags[:n]),
        colors=np.asarray(dev.colors_u32[:n]),
        widths=np.asarray(dev.widths[:n]),
        bboxes=np.asarray(dev.bboxes[:n]),
        pt_offset=np.asarray(dev.pt_offset[:n]),
        n_pts=np.asarray(dev.n_pts[:n]),
        points=np.asarray(dev.points[:npts]),
        flags=np.asarray(dev.flags[:n]),
        clips=np.asarray(dev.clips[:n]),
        grads=np.asarray(dev.grads[:n]),
    )


def _demo_scene():
    b = SceneBuilder()
    b.fill([(30.0, 40.0), (200.0, 60.0), (120.0, 220.0)], 0xCC2200FF)
    b.polyline([(20.0, 20.0), (236.0, 20.0), (236.0, 236.0),
                (20.0, 236.0), (20.0, 20.0)], 0x003399FF, width=5.0)
    b.fill([(60.0, 140.0), (180.0, 120.0), (210.0, 200.0),
            (90.0, 230.0)], 0x22AA44A0)
    return b.build()


def _cfg(scene, headroom=2.0):
    import dataclasses
    cfg = fit_capacities(scene, RenderConfig(
        width=SIZE, height=SIZE, tile_height=16, tile_width=128,
        cmd_capacity=512), bucket=True)
    # Transformed frames change record counts; leave generous room.
    return dataclasses.replace(
        cfg,
        max_segments=2 * cfg.max_segments,
        max_hits=int(headroom * 4 * cfg.max_hits),
        max_candidates=int(headroom * 4 * cfg.max_candidates),
        max_deltas=2 * cfg.max_deltas)


def test_identity_transform_preserves_geometry():
    scene = _demo_scene()
    cfg = _cfg(scene)
    base = prepare_scene(scene, cfg)
    ab = affine.build_base(scene, cfg)
    dev = jax.jit(lambda: affine.transform_device_scene(
        base, ab, jnp.asarray(affine.identity_mats(cfg.max_items))))()
    np.testing.assert_array_equal(
        np.asarray(dev.points[:scene.n_points]), scene.points)
    # Recomputed bboxes may differ from the builder's by quantization of
    # identical real values -- but never by more than one pixel cell.
    assert (np.abs(np.asarray(dev.bboxes[:scene.n_items])
                   - scene.bboxes) <= 1).all()
    np.testing.assert_array_equal(np.asarray(dev.clips[:scene.n_items]),
                                  scene.clips)
    np.testing.assert_array_equal(np.asarray(dev.grads[:scene.n_items]),
                                  scene.grads)


def test_rotation_about_matrix():
    t = 0.7
    m = np.asarray(affine.rotation_about(10.0, 20.0, jnp.float32(t), 1.5))
    p = np.array([37.0, -11.0])
    got = np.array([m[0] * p[0] + m[1] * p[1] + m[4],
                    m[2] * p[0] + m[3] * p[1] + m[5]])
    c, s = 1.5 * np.cos(t), 1.5 * np.sin(t)
    q = p - [10.0, 20.0]
    want = np.array([c * q[0] - s * q[1] + 10.0,
                     s * q[0] + c * q[1] + 20.0])
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)


@pytest.mark.parametrize("t", [0.35, 1.1])
def test_transformed_frame_renders_exactly(t):
    """The scene/animate.py contract: pull the device-transformed arrays
    and render them through BOTH the device pipeline and the numpy
    oracle -- the images must agree (CPU FMA tolerance; strict on
    chip)."""
    scene = _demo_scene()
    cfg = _cfg(scene)
    base = prepare_scene(scene, cfg)
    ab = affine.build_base(scene, cfg)
    mats = affine.rotation_about(128.0, 128.0, jnp.float32(t), 0.8)
    dev = jax.jit(lambda: affine.transform_device_scene(base, ab, mats))()
    fetched = _fetch_scene(dev, scene)
    img = Renderer(cfg, fine_impl="xla").render(fetched)
    gold = cpu_render_scene(fetched, cfg)
    assert_images_match(img, gold)


def test_gradient_and_clip_remap_end_to_end():
    scene = get_scene("gradients", size=SIZE)
    cfg = _cfg(scene)
    base = prepare_scene(scene, cfg)
    ab = affine.build_base(scene, cfg)
    mats = affine.rotation_about(128.0, 128.0, jnp.float32(0.5), 0.9)
    dev = jax.jit(lambda: affine.transform_device_scene(base, ab, mats))()
    fetched = _fetch_scene(dev, scene)
    img = Renderer(cfg, fine_impl="xla").render(fetched)
    gold = cpu_render_scene(fetched, cfg)
    assert_images_match(img, gold)


def test_affine_render_fn_runs_and_is_deterministic():
    scene = _demo_scene()
    cfg = _cfg(scene)
    render_t = affine.make_affine_render_fn(
        cfg, scene,
        lambda t: affine.rotation_about(128.0, 128.0, t, 1.0),
        fine_impl="xla")
    a1, _ = render_t(0.25)
    a2, _ = render_t(0.25)
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
