"""Multi-chip load-balance measurement on the virtual CPU mesh.

VERDICT r4 item 9: the load-balanced interleave partition
(parallel/sharding.py, ``interleave=B``) was justified by argument, not
measurement.  This probe renders the tiger on an 8-device mesh under
both partitions and reports each device's fine-stage WORK -- the
``live_entries`` count the roofline model uses as the fine kernel's work
unit -- plus the imbalance factor max/mean (the wall-clock multiplier an
SPMD step pays over a perfectly balanced one, since every device waits
for the slowest slab).

Run:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
      python tools/mesh_balance.py [--scale 8.0] [--interleave 4]
"""

from __future__ import annotations

import argparse
import json
import sys

sys.path.insert(0, ".")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=float, default=8.0)
    ap.add_argument("--interleave", type=int, default=4)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from piet_tpu.config import RenderConfig
    from piet_tpu.parallel.sharding import ShardedRenderer
    from piet_tpu.renderer.capacity import fit_capacities
    from piet_tpu.scene.svg import make_tiger

    ndev = len(jax.devices())
    mesh = jax.make_mesh((ndev,), ("y",))
    scene = make_tiger(scale=args.scale)
    size = int(np.ceil(scene.bboxes[:, 3].max() + 8))
    # tiles_y must divide evenly across the mesh AND the interleave
    # blocks: round the viewport up to a whole number of row blocks.
    block_px = 32 * ndev * args.interleave
    size = -(-size // block_px) * block_px
    cfg = fit_capacities(scene, RenderConfig(width=size, height=size),
                         bucket=True)

    out = {"n_devices": ndev, "viewport": f"{size}x{size}",
           "scale": args.scale}
    gold = None
    for name, il in (("contiguous", 1), (f"interleave{args.interleave}",
                                         args.interleave)):
        r = ShardedRenderer(cfg, mesh, fine_impl="xla", interleave=il)
        img = r.render(scene)
        if gold is None:
            gold = img
        else:
            # Both partitions must produce the identical image.
            np.testing.assert_array_equal(img, gold)
        le = r.last_stats.get(
            "live_entries", r.last_stats.get("live_cmds")).astype(np.int64)
        out[name] = {
            "live_entries_per_device": le.tolist(),
            "total": int(le.sum()),
            "imbalance_max_over_mean": round(float(le.max())
                                             / max(le.mean(), 1.0), 3),
        }
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
