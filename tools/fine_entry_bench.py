"""Decompose the production fine kernel's cost: ns/entry by class and
the per-tile fixed cost (intercept), on the REAL fine_rasterize_entries.

The arg-delivery microbench (tools/arg_delivery_bench.py) showed the
isolated line update costs ~37 ns/entry full-tile and ~54 with window
logic -- but the production kernel averages ~125 ns/entry at 4K tiger.
This bench times the real kernel on SYNTHETIC streams (every tile the
same entry mix) so the gap is attributed by linear fit:

  ms(n) = tiles * (intercept + n * slope)

over n in {small, medium, large} entries/tile, per class mix:

  lines   -- one line run per tile (+ one CmdStroke resolve)
  fills   -- one plain-fill run per tile (+ one CmdDrawFill resolve)
  edges   -- CmdFillEdge entries (slot-0) + one CmdDrawFill
  resolve -- alternating CmdStroke/CmdSolid entries (resolve-heavy)

Knobs: PIET_RUNS forwarded, so the run-driver cost is measured in the
kernel it actually runs in.

Usage: python tools/fine_entry_bench.py [mix ...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from piet_tpu.layout.entry_stream import (ENTRY_WORDS, W_RUN, W_S0_ARG,
                                          W_S0_TAG, W_S1_ARG, W_S1_TAG)
from piet_tpu.raster.ptcl import (CMD_DRAW_FILL, CMD_FILL, CMD_FILL_EDGE,
                                  CMD_LINE, CMD_SOLID, CMD_STROKE)
from piet_tpu.ops.fine import fine_rasterize_entries

TILE_H, TILE_W = 32, 128
TILES_X, TILES_Y = 8, 8          # 64 tiles; small grid keeps builds fast
FRAMES = 30


def build_stream(mix: str, n: int, rng):
    """Synthetic per-tile entry list, every tile identical in structure.

    Returns (first, n_entries, solid, stream) for a (TILES_Y*TILES_X)
    grid with n entries per tile.
    """
    T = TILES_Y * TILES_X
    total = T * n
    blocks = (total + 127) // 128
    stream = np.zeros((max(blocks, 1), ENTRY_WORDS, 128), np.float32)

    def put(e, word, val):
        stream[e // 128, word, e % 128] = val

    for t in range(T):
        ty, tx = divmod(t, TILES_X)
        x0, y0 = tx * TILE_W, ty * TILE_H
        base = t * n
        for k in range(n):
            e = base + k
            if mix == "lines":
                last = k == n - 1
                if last:
                    put(e, W_S0_TAG, CMD_STROKE)
                    put(e, W_S0_ARG + 0, 1.5)            # half width
                    put(e, W_S0_ARG + 1, 0.8)            # color
                    put(e, W_S0_ARG + 4, 1.0)            # alpha
                    # words 9-12 = s0arg(8..11): NO_CLIP rect
                    for w, v in zip(range(9, 13),
                                    (-1e9, -1e9, 1e9, 1e9)):
                        put(e, w, v)
                else:
                    sx = x0 + rng.uniform(0, TILE_W)
                    sy = y0 + rng.uniform(0, TILE_H)
                    put(e, W_S0_TAG, CMD_LINE)
                    put(e, W_S0_ARG + 0, sx)
                    put(e, W_S0_ARG + 1, sy)
                    put(e, W_S0_ARG + 2, sx + rng.uniform(-9, 9))
                    put(e, W_S0_ARG + 3, sy + rng.uniform(-5, 5))
                    put(e, W_S0_ARG + 4, 2.0)            # thr = hw + .5
                    put(e, W_RUN, -(n - 1 - k))
            elif mix == "fills":
                last = k == n - 1
                if last:
                    put(e, W_S0_TAG, CMD_DRAW_FILL)
                    put(e, W_S0_ARG + 0, 0.0)            # backdrop
                    put(e, W_S0_ARG + 1, 0.6)
                    put(e, W_S0_ARG + 4, 1.0)
                    for w, v in zip(range(9, 13),
                                    (-1e9, -1e9, 1e9, 1e9)):
                        put(e, w, v)
                else:
                    sx = x0 + rng.uniform(0, TILE_W)
                    sy = y0 + rng.uniform(0, TILE_H)
                    put(e, W_S1_TAG, CMD_FILL)
                    put(e, W_S1_ARG + 0, sx)
                    put(e, W_S1_ARG + 1, sy)
                    put(e, W_S1_ARG + 2, sx + rng.uniform(-9, 9))
                    put(e, W_S1_ARG + 3, sy + rng.uniform(-5, 5))
                    put(e, W_RUN, n - 1 - k)
            elif mix == "edges":
                last = k == n - 1
                if last:
                    put(e, W_S0_TAG, CMD_DRAW_FILL)
                    put(e, W_S0_ARG + 1, 0.6)
                    put(e, W_S0_ARG + 4, 1.0)
                    for w, v in zip(range(9, 13),
                                    (-1e9, -1e9, 1e9, 1e9)):
                        put(e, w, v)
                else:
                    put(e, W_S0_TAG, CMD_FILL_EDGE)
                    put(e, W_S0_ARG + 0, 1.0 if k % 2 == 0 else -1.0)
                    put(e, W_S0_ARG + 1, y0 + rng.uniform(0, TILE_H))
            elif mix == "resolve":
                if k % 2 == 0:
                    put(e, W_S0_TAG, CMD_STROKE)
                    put(e, W_S0_ARG + 0, 1.5)
                    put(e, W_S0_ARG + 1, 0.8)
                    put(e, W_S0_ARG + 4, 0.5)
                else:
                    put(e, W_S0_TAG, CMD_SOLID)
                    put(e, W_S0_ARG + 0, 0.5)
                    put(e, W_S0_ARG + 1, 0.4)
                    put(e, W_S0_ARG + 3, 0.5)
                for w, v in zip(range(9, 13), (-1e9, -1e9, 1e9, 1e9)):
                    put(e, w, v)
            else:
                raise SystemExit(f"unknown mix {mix}")

    first = (np.arange(T, dtype=np.int32) * n)
    n_entries = np.full(T, n, np.int32)
    solid = np.zeros(T, np.uint32)
    return first, n_entries, solid, stream


def time_mix(mix: str, n: int, runs: bool) -> float:
    rng = np.random.RandomState(7)
    first, n_entries, solid, stream = build_stream(mix, n, rng)
    dev = jax.devices()[0]
    args = [jax.device_put(x, dev)
            for x in (first, n_entries, solid, stream)]

    def f():
        return fine_rasterize_entries(
            *args, tile_h=TILE_H, tile_w=TILE_W, tiles_x=TILES_X,
            paired=False, runs=runs)

    img = f()
    np.asarray(img[0, 0])
    samples = []
    for _ in range(5):
        t0 = time.perf_counter()
        for _ in range(FRAMES):
            img = f()
        np.asarray(img[0, 0])
        t1 = time.perf_counter()
        np.asarray(img[0, 0])
        t2 = time.perf_counter()
        samples.append(((t1 - t0) - (t2 - t1)) * 1e3 / FRAMES)
    return float(np.median(samples))


def main():
    mixes = sys.argv[1:] or ["lines", "fills", "edges", "resolve"]
    runs = os.environ.get("PIET_RUNS", "1") == "1"
    T = TILES_Y * TILES_X
    print(f"# runs={runs} tiles={T} tile={TILE_W}x{TILE_H}", flush=True)
    NS = (2, 34, 130)
    for mix in mixes:
        ms = [time_mix(mix, n, runs) for n in NS]
        # linear fit ms(n) = T * (intercept + slope * n)
        A = np.vstack([np.ones(len(NS)), np.array(NS)]).T
        coef, *_ = np.linalg.lstsq(A, np.array(ms) * 1e6 / T, rcond=None)
        icept, slope = coef
        pts = " ".join(f"n={n}:{m:.3f}ms" for n, m in zip(NS, ms))
        print(f"{mix:8s} {pts}  ->  {slope:.1f} ns/entry"
              f" + {icept:.0f} ns/tile", flush=True)


if __name__ == "__main__":
    main()
