"""On-chip bisect of the coarse MXU-engine bitwise-equality claim.

Round 2's sweep recorded "engines bit-identical on chip: False"
(tools/onchip_r2.log step 2) with no attribution.  This probe re-runs the
comparison and, when it fails, bisects by engine: each of the coarse
pass's three opt-in Pallas engines (expand / keyed / gatherm; see
piet_tpu/ops/coarse.py::engine_set) runs ALONE against the XLA baseline,
so the diverging engine is named, with the first differing leaf, the
mismatch count, and a sample of differing words.

Each setting renders in its OWN subprocess: one jit cache, one trace, no
env leakage -- and a Mosaic crash in one engine cannot take down the
whole probe.

Usage:  python tools/engine_probe.py            # full bisect (parent)
        python tools/engine_probe.py --child X  # internal: one setting
"""

import json
import os
import subprocess
import sys

# Running as `python tools/engine_probe.py` puts tools/ (not the repo
# root) at sys.path[0]; the package import in run_child needs the root.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SETTINGS = ["xla", "pallas",
            "pallas:expand", "pallas:keyed", "pallas:gatherm"]
LEAVES = ["stream", "first", "n_entries", "counts", "solid"]


def out_path(setting):
    return f"/tmp/engine_probe_{setting.replace(':', '_')}.npz"


def run_child(setting):
    import numpy as np

    from piet_tpu.config import RenderConfig
    from piet_tpu.ops.coarse import coarse_rasterize
    from piet_tpu.renderer.capacity import fit_capacities
    from piet_tpu.renderer.renderer import prepare_scene
    from piet_tpu.scene.svg import make_tiger

    import jax

    scene = make_tiger(scale=19.2)
    cfg = fit_capacities(scene, RenderConfig(
        width=3840, height=2160, tile_height=32, tile_width=128,
        cmd_capacity=1024))
    dev = prepare_scene(scene, cfg)
    kw = dict(tiles_x=cfg.tiles_x, tiles_y=cfg.tiles_y,
              tile_w=cfg.tile_width, tile_h=cfg.tile_height,
              cmd_capacity=cfg.cmd_capacity,
              max_segments=cfg.max_segments, max_hits=cfg.max_hits,
              max_candidates=cfg.max_candidates,
              max_deltas=cfg.max_deltas,
              output="entries", sort_impl="pallas")
    out = jax.jit(
        lambda d: coarse_rasterize(d, expand_impl=setting, **kw))(dev)
    np.savez(out_path(setting),
             **{name: np.asarray(getattr(out, name)) for name in LEAVES})
    print(f"child {setting}: ok")


def bits(x):
    return x.view(np.uint32) if x.dtype == np.float32 else x


def compare(a_npz, b_npz):
    """Return (ok, report_lines) comparing two saved leaf sets bitwise."""
    lines = []
    ok = True
    for name in LEAVES:
        a, b = bits(a_npz[name]), bits(b_npz[name])
        if np.array_equal(a, b):
            continue
        ok = False
        d = np.nonzero((a != b).reshape(-1))[0]
        lines.append(f"    leaf {name}: {d.size}/{a.size} words differ, "
                     f"first at flat index {d[0]}")
        for ix in d[:4]:
            lines.append(f"      [{ix}] {a.reshape(-1)[ix]:#010x} vs "
                         f"{b.reshape(-1)[ix]:#010x}")
    return ok, lines


def main():
    if len(sys.argv) > 2 and sys.argv[1] == "--child":
        run_child(sys.argv[2])
        return

    def child(setting):
        if os.path.exists(out_path(setting)):
            os.unlink(out_path(setting))
        r = subprocess.run(
            [sys.executable, __file__, "--child", setting],
            capture_output=True, text=True, timeout=2400)
        if r.returncode != 0:
            print(f"  {setting}: CHILD FAILED rc={r.returncode}")
            print("\n".join(r.stderr.splitlines()[-6:]))
            return None
        return np.load(out_path(setting))

    print("== engine probe: 4K tiger coarse outputs, bitwise ==")
    base = child("xla")
    if base is None:
        sys.exit(1)
    full = child("pallas")
    verdict = {}
    if full is not None:
        ok, lines = compare(base, full)
        verdict["pallas"] = ok
        print(f"  all-engines vs xla: {'IDENTICAL' if ok else 'DIFFER'}")
        print("\n".join(lines))
        if ok:
            print(json.dumps({"engines_bit_identical": True}))
            return
    for setting in SETTINGS[2:]:
        got = child(setting)
        if got is None:
            verdict[setting] = "crash"
            continue
        ok, lines = compare(base, got)
        verdict[setting] = ok
        print(f"  {setting} vs xla: {'IDENTICAL' if ok else 'DIFFER'}")
        print("\n".join(lines))
    print(json.dumps({"engines_bit_identical": verdict.get("pallas"),
                      "bisect": {k: v for k, v in verdict.items()
                                 if k != "pallas"}}))


if __name__ == "__main__":
    import numpy as np
    main()
