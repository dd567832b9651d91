"""Fused candidate-record expansion: ragged expand + rect decode in one
Pallas kernel (the ops/hitfuse.py template applied to the coarse pass's
FIRST expansion, round-2 profile's largest single stage at ~3.0 ms).

The candidate stage expands per-item attribute rows (NI, 32) into
per-(item, tile-in-bbox) records and decodes each record's tile from its
rank with an exact f32 divmod.  In XLA that is a scatter + cummax + row
gather (scalar-core) plus the divmod chain, all materialized at
max_candidates.  Here the banded-interval MXU matmul performs the
expansion with words on sublanes / candidates on lanes, and the decode
happens on the expanded block in VMEM; the downstream tail-command
assembly (ops/coarse.py) stays in XLA -- it is elementwise and fuses
there, and it needs the winding backdrop which is not known yet.

Output rows per block:
  0-31   the expanded cand_pack words (bit patterns preserved)
  32     cand_tile (f32 integer; garbage beyond the live total)
  33     cand_ty
  34     cand_tx
  35-39  zero padding

Bit-exactness: the divmod is ops/coarse.py::_fdivmod verbatim (exact by
residue correction regardless of rcp rounding); everything else is
transport.  Pinned vs the staged path by tests/test_hitfuse.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .expand import BLK, WIN, _precompute

#: Words per input candidate row (ops/coarse.py::cand_pack).
CAND_WORDS = 32
OUT_ROWS = 40

K_TILE, K_TY, K_TX = 32, 33, 34
#: cand_pack word indices of the packed item ints the decode needs.
W_CEXCL, W_BX0, W_BY0, W_BW = 18, 19, 20, 23


def _candfuse_kernel(lo_ref, nsub_ref, total_ref, row0_ref, rows_hbm,
                     bounds_hbm, out_ref, wbuf, bbuf, acc, sems, *,
                     tiles_x: int):
    b = pl.program_id(0)
    nb = pl.num_programs(0)
    p0 = b * BLK
    total = total_ref[0]
    alive = p0 < total
    f32 = jnp.float32

    def dma(slot, blk_ix, sub):
        start = pl.multiple_of(lo_ref[blk_ix] + sub * WIN, 128)
        return (pltpu.make_async_copy(
                    rows_hbm.at[:, pl.ds(start, WIN)],
                    wbuf.at[slot], sems.at[2 * slot]),
                pltpu.make_async_copy(
                    bounds_hbm.at[:, pl.ds(start, WIN)],
                    bbuf.at[slot], sems.at[2 * slot + 1]))

    def start(slot, blk_ix, sub):
        for d in dma(slot, blk_ix, sub):
            d.start()

    def wait(slot, blk_ix, sub):
        for d in dma(slot, blk_ix, sub):
            d.wait()

    @pl.when((b == 0) & alive)
    def _():
        start(0, 0, 0)

    @pl.when(alive)
    def _():
        wait(b % 2, b, 0)

    @pl.when((b + 1 < nb) & ((b + 1) * BLK < total))
    def _():
        start((b + 1) % 2, b + 1, 0)

    Pf = (p0 + jax.lax.broadcasted_iota(jnp.int32, (BLK, WIN), 0)
          ).astype(f32)

    def accum(slot):
        lo_b = bbuf[slot, 0:1, :]
        hi_b = bbuf[slot, 1:2, :]
        m = jnp.where((lo_b <= Pf) & (Pf < hi_b), 1.0, 0.0
                      ).astype(jnp.bfloat16)
        return jax.lax.dot_general(
            wbuf[slot], m, (((1,), (1,)), ((), ())),
            preferred_element_type=f32)

    @pl.when(jnp.logical_not(alive))
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    @pl.when(alive)
    def _():
        acc[...] = accum(b % 2)
        nsub = nsub_ref[b]

        @pl.when(nsub > 1)
        def _():
            def body(sub, _):
                start(2, b, sub)
                wait(2, b, sub)
                acc[...] += accum(2)
                return 0
            jax.lax.fori_loop(1, nsub, body, 0)

        def word_i32(k):
            q0 = acc[4 * k + 0:4 * k + 1, :].astype(jnp.int32)
            q1 = acc[4 * k + 1:4 * k + 2, :].astype(jnp.int32)
            q2 = acc[4 * k + 2:4 * k + 3, :].astype(jnp.int32)
            q3 = acc[4 * k + 3:4 * k + 4, :].astype(jnp.int32)
            return (q0 << 24) | (q1 << 16) | (q2 << 8) | q3

        def word_f32(k):
            return jax.lax.bitcast_convert_type(word_i32(k), f32)

        # ---- rect decode (ops/coarse.py lines around cand_local; the
        # divmod is _fdivmod verbatim: exact under any rcp error < 1) --
        idx = p0 + jax.lax.broadcasted_iota(jnp.int32, (1, BLK), 1)
        cexcl = word_i32(W_CEXCL)
        bx0 = word_i32(W_BX0)
        by0 = word_i32(W_BY0)
        bw = word_i32(W_BW)
        local = idx - cexcl
        w = jnp.maximum(bw, 1)
        wf = w.astype(f32)
        q = jnp.floor(local.astype(f32) / wf).astype(jnp.int32)
        r = local - q * w
        q = q + jnp.where(r >= w, 1, 0) - jnp.where(r < 0, 1, 0)
        c_dy, c_dx = q, local - q * w
        cand_ty = by0 + c_dy
        cand_tx = bx0 + c_dx
        row0 = row0_ref[0]
        cand_tile = (cand_ty - row0) * tiles_x + cand_tx

        def put(k, v):
            out_ref[0, k:k + 1, :] = v

        for k in range(CAND_WORDS):
            put(k, word_f32(k))
        put(K_TILE, cand_tile.astype(f32))
        put(K_TY, cand_ty.astype(f32))
        put(K_TX, cand_tx.astype(f32))
        z = jnp.zeros((1, BLK), f32)
        for k in range(K_TX + 1, OUT_ROWS):
            put(k, z)


@functools.partial(jax.jit, static_argnames=("cap", "tiles_x", "interpret"))
def cand_records_fused(cand_pack: jax.Array, counts: jax.Array,
                       excl: jax.Array, total: jax.Array, row0, cap: int, *,
                       tiles_x: int, interpret: bool = False):
    """Expand per-item rows into candidate records with tile decode.

    Args:
      cand_pack: (NI, 32) f32 rows (ops/coarse.py::cand_pack).
      counts/excl: (NI,) int32 tile-rect areas and their exclusive cumsum.
      total: () int32 live candidate count.
      row0: traced int32 first tile row of the slab.
      cap: static candidate capacity.

    Returns (ca, cand_tile, cand_ty, cand_tx): ca is (cap, 32) f32 with
    the exact expansion bit patterns (all-zero rows at and beyond
    ``total``); the decoded vectors are f32 integers (garbage beyond
    ``total``, exactly like the staged path's).
    """
    S, W = cand_pack.shape
    assert W == CAND_WORDS
    cap_pad = ((cap + BLK - 1) // BLK) * BLK
    assert cap_pad < 2 ** 24

    u = jax.lax.bitcast_convert_type(cand_pack, jnp.uint32)
    quarters = jnp.stack([(u >> 24).astype(jnp.bfloat16),
                          ((u >> 16) & 0xFF).astype(jnp.bfloat16),
                          ((u >> 8) & 0xFF).astype(jnp.bfloat16),
                          (u & 0xFF).astype(jnp.bfloat16)], axis=2)
    rows_f = quarters.reshape(S, 4 * W)

    s_pad = (S // WIN + 2) * WIN
    pad = s_pad - S
    rows_T = jnp.pad(rows_f, ((0, pad), (0, 0))).T

    dead = jnp.float32(cap_pad)
    bounds = jnp.stack(
        [jnp.where(counts > 0, excl.astype(jnp.float32), dead),
         jnp.where(counts > 0, (excl + counts).astype(jnp.float32), dead)])
    bounds_p = jnp.pad(bounds, ((0, 6), (0, pad)))
    bounds_p = bounds_p.at[0, S:].set(dead)

    lo, n_sub = _precompute(excl, counts, cap_pad, s_pad)

    kernel = functools.partial(_candfuse_kernel, tiles_x=tiles_x)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(cap_pad // BLK,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM),
                  pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec((1, OUT_ROWS, BLK),
                               lambda b, lo, ns, t, r0: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((3, 4 * CAND_WORDS, WIN), jnp.bfloat16),
            pltpu.VMEM((3, 8, WIN), jnp.float32),
            pltpu.VMEM((4 * CAND_WORDS, BLK), jnp.float32),
            pltpu.SemaphoreType.DMA((6,)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((cap_pad // BLK, OUT_ROWS, BLK),
                                       jnp.float32),
        interpret=interpret,
    )(lo, n_sub, total.reshape(1),
      jnp.asarray(row0, jnp.int32).reshape(1), rows_T, bounds_p)

    ca = out[:, :CAND_WORDS, :].transpose(0, 2, 1).reshape(
        cap_pad, CAND_WORDS)[:cap]

    def col(k):
        return out[:, k, :].reshape(cap_pad)[:cap]

    return ca, col(K_TILE), col(K_TY), col(K_TX)
