"""Size the batched-group fine-kernel design (round-3 perf item).

For each BASELINE config, runs the coarse pass (CPU backend is fine --
the stream is bit-identical across backends for this purpose) and
reports, per run class (line runs W_RUN<0, plain-fill runs W_RUN>0):

  * live entries and share sitting in runs,
  * aligned 8-entry groups (positions p%8==0 with remaining run >= 8)
    and the entry share they cover -- the batched path's reach,
  * union row-window distribution per group (would the group's 8
    segments fit an 8/16/24-row window, or need the full tile?),

which decides whether sublane-batched interpretation (8 entries per
vector op, operands from a VMEM side stream) can cut the measured
~60 ns/entry scalar-dispatch wall, and what static window size to pick.

Usage: JAX_PLATFORMS=cpu python tools/group_stats.py [config ...]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np  # noqa: E402

from piet_tpu.layout.entry_stream import (W_RUN, W_S0_ARG, W_S1_ARG,  # noqa: E402
                                          W_S0_TAG)


CONFIGS = {
    "tiger_4k": (lambda: _tiger(19.2), 3840, 2160),
    "tiger_8x": (lambda: _tiger(8.0), 1664, 1664),
    "beziers_10k": (lambda: _fixture("beziers_10k"), 1024, 1024),
    "glyph_page_5k": (lambda: _fixture("glyph_page"), 1024, 1024),
    "circles_rects_1k": (lambda: _fixture("circles_rects"), 1024, 1024),
}


def _tiger(scale):
    from piet_tpu.scene.svg import make_tiger
    return make_tiger(scale=scale)


def _fixture(name):
    from piet_tpu.scene import fixtures
    return fixtures.get_scene(name)


def analyze(name):
    import jax
    from piet_tpu.config import RenderConfig
    from piet_tpu.ops.coarse import coarse_rasterize
    from piet_tpu.renderer.capacity import fit_capacities
    from piet_tpu.renderer.renderer import prepare_scene

    make, w, h = CONFIGS[name]
    scene = make()
    cfg = fit_capacities(scene, RenderConfig(
        width=w, height=h, tile_height=32, tile_width=128,
        cmd_capacity=1024))
    dev = prepare_scene(scene, cfg)
    out = jax.jit(lambda d: coarse_rasterize(
        d, tiles_x=cfg.tiles_x, tiles_y=cfg.tiles_y,
        tile_w=cfg.tile_width, tile_h=cfg.tile_height,
        cmd_capacity=cfg.cmd_capacity, max_segments=cfg.max_segments,
        max_hits=cfg.max_hits, max_candidates=cfg.max_candidates,
        max_deltas=cfg.max_deltas, output="entries",
        sort_impl="xla", pair="off"))(dev)

    th = cfg.tile_height
    stream = np.asarray(out.stream)            # (B, 16, 128)
    E = stream.shape[0] * 128
    ent = stream.transpose(0, 2, 1).reshape(E, 16)  # (E, 16) word-major
    rw = ent[:, W_RUN]
    live = ent[:, W_S0_TAG] != 0
    live |= ent[:, 8] != 0  # slot-1-only (plain fill) entries
    n_live = int(live.sum())
    print(f"== {name}: {E} slots, {n_live} live entries, "
          f"tiles {cfg.tiles_x}x{cfg.tiles_y} tile {cfg.tile_width}x{th}")

    # Per-tile y0 for window math: recover tile of each entry from the
    # per-tile ranges.
    first = np.asarray(out.first)
    n_ent = np.asarray(out.n_entries)
    tile_of = np.full(E, -1, np.int64)
    for t in np.nonzero(n_ent > 0)[0]:
        tile_of[first[t]:first[t] + n_ent[t]] = t
    ty = np.where(tile_of >= 0, tile_of // cfg.tiles_x, 0)
    y0 = (ty * th).astype(np.float32)

    for cls, sgn in (("line", -1), ("fill", +1)):
        in_run = (sgn * rw) > 0
        n_run = int(in_run.sum())
        # Run-START histogram: a run of length L starts where the
        # remaining count equals the full length (previous entry is not
        # in the same run, i.e. remaining jumps).
        rem = np.where(in_run, sgn * rw, 0).astype(np.int64)
        prev = np.concatenate([[0], rem[:-1]])
        starts = in_run & (prev != rem + 1)
        lens = rem[starts]
        if lens.size:
            hist = np.bincount(np.clip(lens, 0, 33))
            print(f"  {cls}: {n_run} run entries "
                  f"({100*n_run/max(n_live,1):.1f}% of live), "
                  f"{lens.size} runs, mean len {lens.mean():.1f}")
            print(f"    run-length hist (1..16,17+): "
                  f"{list(hist[1:17])} {int((lens >= 17).sum())}")
            for bs in (4, 8):
                # Groups formable INSIDE runs (no absolute alignment):
                # floor(L / bs) per run; padding to multiples of bs
                # costs (bs - L % bs) % bs dummy members per run.
                cover = (lens // bs * bs).sum()
                padded = ((lens + bs - 1) // bs * bs).sum()
                print(f"    batch-{bs}: unpadded covers {cover} "
                      f"({100*cover/max(n_live,1):.1f}% of live); padded "
                      f"stream adds {int(padded - lens.sum())} dummies "
                      f"({100*(padded - lens.sum())/max(n_live,1):.1f}%)")
        else:
            print(f"  {cls}: {n_run} run entries, 0 runs")
            continue
        # Window stats for batch-of-4/8 groups formed WITHIN runs, after
        # sorting each run's members by their single-entry window start
        # (legal for lines: min is order-free; for fills it implies the
        # tree-order oracle redefinition).
        base = W_S0_ARG if cls == "line" else W_S1_ARG
        sy = ent[:, base + 1]
        ey = ent[:, base + 3]
        if cls == "line":
            thr = ent[:, base + 4]
            lo = np.minimum(sy, ey) - thr
            hi = np.maximum(sy, ey) + thr
        else:
            lo = np.minimum(sy, ey)
            hi = np.maximum(sy, ey)
        li = (lo - y0).astype(np.int64) - 1
        hh = (hi - y0).astype(np.int64) + 2
        rs1 = np.clip(li & ~7, 0, th - 8)
        fits1 = hh <= rs1 + 8
        ridx = np.nonzero(in_run)[0]
        print(f"    single-entry 8-row fit: {100*fits1[ridx].mean():.1f}%")
        run_id = np.cumsum(starts)[ridx]     # 1-based run id per member
        for bs in (4, 8):
            ws, nfit = [], 0
            order = np.lexsort((li[ridx], run_id))
            rr, ll, hh2 = run_id[order], li[ridx][order], hh[ridx][order]
            # split by run, form groups of bs in sorted order
            cuts = np.nonzero(np.diff(rr))[0] + 1
            for seg_l, seg_h in zip(np.split(ll, cuts), np.split(hh2, cuts)):
                for q in range(0, len(seg_l) - bs + 1, bs):
                    glo = seg_l[q:q+bs].min()
                    ghi = seg_h[q:q+bs].max()
                    ws.append(ghi - max(min(glo & ~7, th - 8), 0))
            ws = np.asarray(ws)
            if ws.size:
                for wr in (8, 16):
                    print(f"    sorted batch-{bs} union fits {wr} rows: "
                          f"{100*(ws <= wr).mean():.1f}% of "
                          f"{ws.size} groups")


if __name__ == "__main__":
    names = sys.argv[1:] or ["tiger_4k", "beziers_10k", "tiger_8x",
                             "glyph_page_5k"]
    for nm in names:
        analyze(nm)
