"""Measure per-entry operand-delivery cost: SMEM scalars vs VMEM splats
vs sublane-batched groups (round-3 fine-kernel redesign decision).

ROADMAP's measured conclusion: the fine interpreter pays ~60 ns/entry on
the SCALAR unit (12 SMEM operand reads + index math) on top of ~20
vector ops.  The Mosaic probes (tools/mosaic_probe.py) proved three
alternative delivery mechanisms lower; this bench times them on the
chip with the fine kernel's dependency structure (loop-carried state,
windowed 8-row updates):

  smem    -- today's path: per-entry scalar reads drive vector-scalar ops
  vmem    -- per-entry (1,1) VMEM loads + pltpu.repeat splats (design X)
  batch8  -- 8 entries per iteration, operands as (8,1) dynamic-sublane
             loads, math over (8 members, 128 lanes) x 8 unrolled window
             rows, sublane min-reduce (design Y; valid for order-free
             accumulations = lines)

Each runs the line_field_sq op mix.  batch8 does 8x the vector work per
iteration (8 rows x 8 members = 64 entry-rows vs 8 entry-rows for the
per-entry variants' one (8,128) window), so equal ns/entry means batch8
is computing the SAME window work with an 8x narrower dispatch.

Usage: python tools/arg_delivery_bench.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 2048          # entries per kernel invocation
REPS = 256        # interpret the stream this many times per launch
# (N*REPS ~ 524k entries ~ tens of ms of kernel time: the host<->chip
# tunnel sync is ~tens of ms, so a launch must dwarf it; the idle-queue
# fetch is additionally timed and subtracted, as in bench.py)


def _chain(sx, sy, ex, ey, X, Y, st):
    """line_field_sq op mix: subs, muls, div, clamps, min-accumulate."""
    lvx, lvy = ex - sx, ey - sy
    dpx, dpy = X - sx, Y - sy
    denom = lvx * lvx + lvy * lvy
    dotp = lvx * dpx + lvy * dpy
    t = jnp.where(denom > 0.0, jnp.clip(dotp / denom, 0.0, 1.0), 0.0)
    fx = lvx * t - dpx
    fy = lvy * t - dpy
    return jnp.minimum(st, fx * fx + fy * fy)


def k_smem(s_ref, out_ref, st_ref):
    """Per-entry SMEM scalar operands (today's delivery)."""
    X = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1).astype(jnp.float32)
    Y = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0).astype(jnp.float32)
    st_ref[:] = jnp.full((8, 128), 1e18, jnp.float32)

    def body(r, _):
        j = r % N
        st_ref[:] = _chain(s_ref[0, j], s_ref[1, j], s_ref[2, j],
                           s_ref[3, j], X, Y, st_ref[:])
        return 0

    jax.lax.fori_loop(0, N * REPS, body, 0)
    out_ref[:] = st_ref[:]


def k_vmem(t_ref, out_ref, st_ref):
    """Per-entry (1,1) VMEM loads + repeat splats (design X)."""
    X = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1).astype(jnp.float32)
    Y = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0).astype(jnp.float32)
    st_ref[:] = jnp.full((8, 128), 1e18, jnp.float32)

    def body(r, _):
        j = r % N

        def arg(k):
            return pltpu.repeat(t_ref[pl.ds(j, 1), k:k+1], 8, 0)  # (8,1)

        st_ref[:] = _chain(arg(0), arg(1), arg(2), arg(3), X, Y, st_ref[:])
        return 0

    jax.lax.fori_loop(0, N * REPS, body, 0)
    out_ref[:] = st_ref[:]


def k_smem16(s_ref, out_ref, st_ref, st2_ref):
    """Per-entry SMEM scalars, FULL 16-row tile (2 vregs), no branches."""
    X = jax.lax.broadcasted_iota(jnp.int32, (16, 128), 1).astype(jnp.float32)
    Y = jax.lax.broadcasted_iota(jnp.int32, (16, 128), 0).astype(jnp.float32)
    st2_ref[:] = jnp.full((16, 128), 1e18, jnp.float32)

    def body(r, _):
        j = r % N
        st2_ref[:] = _chain(s_ref[0, j], s_ref[1, j], s_ref[2, j],
                            s_ref[3, j], X, Y, st2_ref[:])
        return 0

    jax.lax.fori_loop(0, N * REPS, body, 0)
    out_ref[:] = st2_ref[0:8, :]


def k_smem_win(s_ref, out_ref, st_ref, st2_ref):
    """Per-entry SMEM scalars + production-like row-window logic: compute
    a window from 3 more scalar reads, branch fits/not, dynamic-slice
    update (the fine kernel's line_one shape)."""
    X = jax.lax.broadcasted_iota(jnp.int32, (16, 128), 1).astype(jnp.float32)
    st2_ref[:] = jnp.full((16, 128), 1e18, jnp.float32)
    WH = 8

    def body(r, _):
        j = r % N
        sy, ey, thr = s_ref[1, j], s_ref[3, j], s_ref[4, j]
        lo = jnp.minimum(sy, ey) - thr
        hi = jnp.maximum(sy, ey) + thr
        rs = jnp.clip(jnp.floor(lo).astype(jnp.int32), 0, 16 - WH)
        fits = (jnp.ceil(hi).astype(jnp.int32) - rs) <= WH

        @pl.when(fits)
        def _():
            YW = (jax.lax.broadcasted_iota(jnp.int32, (WH, 128), 0)
                  .astype(jnp.float32) + rs.astype(jnp.float32))
            st2_ref[pl.ds(rs, WH), :] = _chain(
                s_ref[0, j], sy, s_ref[2, j], ey, X[0:WH, :], YW,
                st2_ref[pl.ds(rs, WH), :])

        @pl.when(jnp.logical_not(fits))
        def _():
            Y = jax.lax.broadcasted_iota(
                jnp.int32, (16, 128), 0).astype(jnp.float32)
            st2_ref[:] = _chain(s_ref[0, j], sy, s_ref[2, j], ey, X, Y,
                                st2_ref[:])
        return 0

    jax.lax.fori_loop(0, N * REPS, body, 0)
    out_ref[:] = st2_ref[0:8, :]


def k_batch8_16(t_ref, out_ref, st_ref, st2_ref):
    """8-member groups over a FULL 16-row tile: (8,1) operands, 16
    unrolled rows, sublane min-reduce per row."""
    X = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1).astype(jnp.float32)
    st2_ref[:] = jnp.full((16, 128), 1e18, jnp.float32)
    NG = N // 8

    def body(r, _):
        j = (r % NG) * 8
        sx = t_ref[pl.ds(j, 8), 0:1]
        sy = t_ref[pl.ds(j, 8), 1:2]
        ex = t_ref[pl.ds(j, 8), 2:3]
        ey = t_ref[pl.ds(j, 8), 3:4]
        for row in range(16):
            f = _chain(sx, sy, ex, ey, X, jnp.float32(row),
                       jnp.full((8, 128), 1e18, jnp.float32))
            red = jnp.min(f, axis=0, keepdims=True)       # (1,128)
            st2_ref[pl.ds(row, 1), :] = jnp.minimum(
                st2_ref[pl.ds(row, 1), :], red)
        return 0

    jax.lax.fori_loop(0, NG * REPS, body, 0)
    out_ref[:] = st2_ref[0:8, :]


def k_smem32(s_ref, out_ref, st_ref, st2_ref):
    """Per-entry SMEM scalars, FULL 32-row tile (4 vregs), no branches
    (the production tile_h)."""
    X = jax.lax.broadcasted_iota(jnp.int32, (32, 128), 1).astype(jnp.float32)
    Y = jax.lax.broadcasted_iota(jnp.int32, (32, 128), 0).astype(jnp.float32)
    st2_ref[:] = jnp.full((32, 128), 1e18, jnp.float32)

    def body(r, _):
        j = r % N
        st2_ref[:] = _chain(s_ref[0, j], s_ref[1, j], s_ref[2, j],
                            s_ref[3, j], X, Y, st2_ref[:])
        return 0

    jax.lax.fori_loop(0, N * REPS, body, 0)
    out_ref[:] = st2_ref[0:8, :]


def k_smem_win32(s_ref, out_ref, st_ref, st2_ref):
    """Window logic on a 32-row tile (the production rowwin shape)."""
    X = jax.lax.broadcasted_iota(jnp.int32, (32, 128), 1).astype(jnp.float32)
    st2_ref[:] = jnp.full((32, 128), 1e18, jnp.float32)
    WH = 8

    def body(r, _):
        j = r % N
        sy, ey, thr = s_ref[1, j], s_ref[3, j], s_ref[4, j]
        lo = jnp.minimum(sy, ey) - thr
        hi = jnp.maximum(sy, ey) + thr
        rs = jnp.clip(jnp.floor(lo).astype(jnp.int32), 0, 32 - WH)
        fits = (jnp.ceil(hi).astype(jnp.int32) - rs) <= WH

        @pl.when(fits)
        def _():
            YW = (jax.lax.broadcasted_iota(jnp.int32, (WH, 128), 0)
                  .astype(jnp.float32) + rs.astype(jnp.float32))
            st2_ref[pl.ds(rs, WH), :] = _chain(
                s_ref[0, j], sy, s_ref[2, j], ey, X[0:WH, :], YW,
                st2_ref[pl.ds(rs, WH), :])

        @pl.when(jnp.logical_not(fits))
        def _():
            Y = jax.lax.broadcasted_iota(
                jnp.int32, (32, 128), 0).astype(jnp.float32)
            st2_ref[:] = _chain(s_ref[0, j], sy, s_ref[2, j], ey, X, Y,
                                st2_ref[:])
        return 0

    jax.lax.fori_loop(0, N * REPS, body, 0)
    out_ref[:] = st2_ref[0:8, :]


def k_disp16(s_ref, out_ref, st_ref, st2_ref):
    """smem16 + the production dispatch shape: tag read, 4 pl.when
    class branches (one taken), a second-slot tag check -- measures the
    per-entry BRANCH overhead in isolation."""
    X = jax.lax.broadcasted_iota(jnp.int32, (16, 128), 1).astype(jnp.float32)
    Y = jax.lax.broadcasted_iota(jnp.int32, (16, 128), 0).astype(jnp.float32)
    st2_ref[:] = jnp.full((16, 128), 1e18, jnp.float32)

    def body(r, _):
        j = r % N
        tag = s_ref[5, j].astype(jnp.int32)  # always 3 in the data

        @pl.when(tag == 3)
        def _():
            st2_ref[:] = _chain(s_ref[0, j], s_ref[1, j], s_ref[2, j],
                                s_ref[3, j], X, Y, st2_ref[:])

        @pl.when(tag == 6)
        def _():
            st2_ref[:] = st2_ref[:] + s_ref[0, j]

        @pl.when(s_ref[6, j] == 4.0)  # slot-1 tag check (never taken)
        def _():
            st2_ref[:] = jnp.minimum(st2_ref[:], s_ref[1, j])

        @pl.when(tag >= 5)
        def _():
            st2_ref[:] = st2_ref[:] * s_ref[2, j]
        return 0

    jax.lax.fori_loop(0, N * REPS, body, 0)
    out_ref[:] = st2_ref[0:8, :]


def k_batch8(t_ref, out_ref, st_ref):
    """8-member groups, (8,1) operands, 8 unrolled rows (design Y)."""
    X = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1).astype(jnp.float32)
    st_ref[:] = jnp.full((8, 128), 1e18, jnp.float32)
    NG = N // 8

    def body(r, _):
        j = (r % NG) * 8
        sx = t_ref[pl.ds(j, 8), 0:1]
        sy = t_ref[pl.ds(j, 8), 1:2]
        ex = t_ref[pl.ds(j, 8), 2:3]
        ey = t_ref[pl.ds(j, 8), 3:4]
        for row in range(8):
            f = _chain(sx, sy, ex, ey, X, jnp.float32(row),
                       jnp.full((8, 128), 1e18, jnp.float32))
            red = jnp.min(f, axis=0, keepdims=True)       # (1,128)
            st_ref[pl.ds(row, 1), :] = jnp.minimum(
                st_ref[pl.ds(row, 1), :], red)
        return 0

    jax.lax.fori_loop(0, NG * REPS, body, 0)
    out_ref[:] = st_ref[:]


def run(name, kernel, smem, per_iter_entries, big=0):
    scr = [pltpu.VMEM((8, 128), jnp.float32)]
    if big:
        scr.append(pltpu.VMEM((big, 128), jnp.float32))
    f = pl.pallas_call(
        kernel,
        grid=(1,),
        in_specs=[pl.BlockSpec(
            memory_space=pltpu.SMEM if smem else pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, 128), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        scratch_shapes=scr,
    )
    rng = np.random.RandomState(0)
    data = rng.uniform(0, 128, size=(N, 16)).astype(np.float32)
    x = jnp.asarray(np.ascontiguousarray(data[:, :8].T)) if smem \
        else jnp.asarray(data)
    jf = jax.jit(f)
    np.asarray(jf(x))
    samples = []
    for _ in range(5):
        t0 = time.perf_counter()
        o = jf(x)
        np.asarray(o[0, 0])
        t1 = time.perf_counter()
        np.asarray(o[0, 0])  # idle-queue fetch: pure sync cost
        t2 = time.perf_counter()
        samples.append(((t1 - t0) - (t2 - t1)) / (N * REPS) * 1e9)
    ns = float(np.median(samples))
    print(f"{name}: {ns:.1f} ns/entry", flush=True)
    return ns


def main():
    names = sys.argv[1:]
    all_runs = [
        ("smem    ", k_smem, True, 1, 0),
        ("vmem    ", k_vmem, False, 1, 0),
        ("batch8  ", k_batch8, False, 8, 0),
        ("smem16  ", k_smem16, True, 1, 16),
        ("smem_win", k_smem_win, True, 1, 16),
        ("batch816", k_batch8_16, False, 8, 16),
        ("smem32  ", k_smem32, True, 1, 32),
        ("smemw32 ", k_smem_win32, True, 1, 32),
        ("disp16  ", k_disp16, True, 1, 16),
    ]
    for nm, k, sm, pe, big in all_runs:
        if names and nm.strip() not in names:
            continue
        run(nm, k, sm, pe, big)


if __name__ == "__main__":
    main()
