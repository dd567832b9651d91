"""Fused hit-record pipeline: expansion + exact tests + row assembly in
ONE Pallas kernel (ROADMAP item 1, VERDICT round-2 item 2).

The XLA coarse pass derives hit records in four materialized stages --
ragged expansion of per-segment rows (scatter + cummax + gather), f32
divmod tile decode, the exact per-record sign tests, and the 16-word
entry-row assembly -- each a full HBM round-trip over max_hits records.
This kernel keeps a block of hit records in VMEM end to end:

* expansion rides the banded-interval MXU matmul of ops/expand.py, in
  the TRANSPOSED orientation: out[word, hit] = sum_s rows_T[word, s] *
  M[hit, s], so every decoded word is a (1, BLK) lane vector ready for
  vector math (the straight orientation would put words on lanes and
  slots on sublanes, leaving per-word math at 1/128 lane occupancy);
* 32-bit payloads ship as four exact 8-bit bf16 quarters (ops/expand.py
  module doc) and recombine in-kernel with integer shifts;
* the tile decode, the reference's exact f32 sign tests
  (PietRender.metal:307-354 fill, :411-435 stroke), the two command
  slots, the entry meta word, and the packed sort key are all computed
  on (1, BLK) rows and written as one (24, BLK) block.

Bit-exactness: all f32 expressions are copied VERBATIM from
ops/coarse.py (which matches raster/cpu_tiler.py).  Mosaic contracts no
mul+add chains, so the XLA path's explicit optimization barriers are
simply dropped.  Every division (t_edge and the round-5 per-command
fill/line constants m, K, inv_denom) rides cmd_math.py::div_det, whose
exact-residual selection is seed-independent -- Mosaic's rcp-seeded
quotient and XLA:TPU's agree bitwise anyway (tools/div_probe.py), and
both match the numpy oracle's div_det_np by construction; the divmod
tile decode carries the residue correction of ops/coarse.py::_fdivmod
and is exact regardless.

Output rows (per hit h, lane h % BLK of block h // BLK):
  0-15   the entry words (layout/entry_stream.py word map)
  16     packed sort key: tile * stride + item * 2, +inf when dead
  17     h_cand (f32 integer): the hit's candidate slot
  18     hit_n_cmds (0/1/2)
  19     s_cand_excl (the item's first candidate slot)
  20     cand_end (one past the item's last candidate slot)
  21     d_val: winding-delta value (+-1; 0 = no delta -- round-5 fold)
  22     d_cand: the delta's target candidate slot (0 when d_val == 0)
  23     zero padding (tile-aligned block height)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..layout.entry_stream import META_CLEAR_BIT
from ..raster.ptcl import CMD_FILL, CMD_FILL_EDGE, CMD_LINE
from .cmd_math import div_det
from .expand import BLK, WIN, _precompute

#: Words per input segment row: 12 f32 geometry + 11 i32 + 3 per-segment
#: division constants (inv_denom, m, K -- round-5 division-free fine
#: math) + hit_excl.
SEG_WORDS = 27
#: Quarter-plane row count, padded to a sublane multiple: Mosaic rejects
#: HBM slices whose leading (sublane) extent is not 8-aligned.
QROWS = ((4 * SEG_WORDS + 7) // 8) * 8
#: Output rows per block (21 live + 3 pad; f32 tile height 8 divides 24).
OUT_ROWS = 24

K_KEY, K_CAND, K_NCMDS, K_CEXCL, K_CEND = 16, 17, 18, 19, 20
K_DVAL, K_DCAND = 21, 22


def _hitfuse_kernel(lo_ref, nsub_ref, total_ref, row0_ref, rows_hbm,
                    bounds_hbm, out_ref, wbuf, bbuf, acc, sems, *,
                    tile_w: int, tile_h: int, tiles_x: int, stride: int,
                    cap_pad: int, interpret: bool):
    if interpret:
        # XLA:CPU (interpret mode) may contract mul+add into FMAs; the
        # barrier sites mirror ops/coarse.py::_bar exactly so the fused
        # and XLA paths agree bitwise on CPU.  Mosaic never contracts:
        # identity on hardware.
        bar = jax.lax.optimization_barrier
    else:
        def bar(x):
            return x
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

    # Cross-block double buffering, exactly ops/expand.py's schedule:
    # block b's first sub-window is prefetched by block b-1 into slot
    # b % 2; slot 2 serves rare in-block extra sub-windows.
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
        # out[word, hit] = rows_T[word, s] @ M[hit, s]^T: one MXU pass.
        return jax.lax.dot_general(
            wbuf[slot], m, (((1,), (1,)), ((), ())),
            preferred_element_type=f32)

    @pl.when(jnp.logical_not(alive))
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)
        # Dead keys must sort last.
        out_ref[0, K_KEY:K_KEY + 1, :] = jnp.full((1, BLK), jnp.inf, f32)

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

        # ---- recombine quarters -> one (1, BLK) row per word ----------
        # int32 throughout (Mosaic has no f32->u32 cast); the quarters
        # are exact 0..255, and i32 shift_left wraps bitwise, so the
        # high-byte shift into the sign bit reproduces the u32 pattern.
        def word_i32(k):
            q0 = acc[4 * k + 0:4 * k + 1, :].astype(jnp.int32)
            q1 = acc[4 * k + 1:4 * k + 2, :].astype(jnp.int32)
            q2 = acc[4 * k + 2:4 * k + 3, :].astype(jnp.int32)
            q3 = acc[4 * k + 3:4 * k + 4, :].astype(jnp.int32)
            return (q0 << 24) | (q1 << 16) | (q2 << 8) | q3

        def word_f32(k):
            return jax.lax.bitcast_convert_type(word_i32(k), f32)

        h_sx, h_sy, h_ex, h_ey = (word_f32(0), word_f32(1), word_f32(2),
                                  word_f32(3))
        h_a, h_b, h_c = word_f32(4), word_f32(5), word_f32(6)
        xmn_x, xmn_y = word_f32(7), word_f32(8)
        xmx_x, xmx_y = word_f32(9), word_f32(10)
        h_hw = word_f32(11)
        h_flags = word_i32(12)
        rxlo, rylo, rw = word_i32(13), word_i32(14), word_i32(15)
        h_item = word_i32(16)
        cexcl = word_i32(17)
        by0, bw, bx0, by1 = (word_i32(18), word_i32(19), word_i32(20),
                             word_i32(21))
        # word 22 (s_bx1) is unused here; words 23-25 are the per-segment
        # division constants; word 26 is hit_excl.
        h_invd, h_m, h_K = word_f32(23), word_f32(24), word_f32(25)
        excl = word_i32(26)

        # ---- tile decode (exact f32 divmod; ops/coarse.py::_fdivmod) --
        idx = p0 + jax.lax.broadcasted_iota(jnp.int32, (1, BLK), 1)
        valid = idx < total
        local = idx - excl
        h_w = jnp.maximum(rw, 1)
        wf = h_w.astype(f32)
        q = jnp.floor(local.astype(f32) / wf).astype(jnp.int32)
        r = local - q * h_w
        q = q + jnp.where(r >= h_w, 1, 0) - jnp.where(r < 0, 1, 0)
        h_dy, h_dx = q, local - q * h_w
        h_ty = rylo + h_dy
        h_tx = rxlo + h_dx
        row0 = row0_ref[0]
        h_tile = (h_ty - row0) * tiles_x + h_tx
        h_cand = cexcl + (h_ty - by0) * bw + (h_tx - bx0)
        cand_end = cexcl + (by1 - by0 + 1) * bw

        twf = f32(tile_w)
        thf = f32(tile_h)
        x0f = h_tx.astype(f32) * twf
        y0f = h_ty.astype(f32) * thf
        h_is_fill = ((h_flags & 1) != 0) & valid
        h_is_stroke = ((h_flags & 2) != 0) & valid

        # ---- exact fill tests (verbatim ops/coarse.py; Mosaic does not
        # contract mul+add, so the XLA path's barriers drop out) --------
        ycull = (xmx_y >= y0f) & (xmn_y < y0f + thf)
        left = bar(h_a * x0f)
        right = bar(h_a * (x0f + twf))
        ytop = jnp.maximum(y0f, xmn_y)
        ybot = jnp.minimum(y0f + thf, xmx_y)
        top = bar(h_b * ytop)
        bot = bar(h_b * ybot)
        s00 = jnp.sign(top + left + h_c)
        s01 = jnp.sign(top + right + h_c)
        s10 = jnp.sign(bot + left + h_c)
        s11 = jnp.sign(bot + right + h_c)
        four = s00 * s01 + s00 * s10 + s00 * s11 < f32(3.0)
        crosses_left = (xmn_x < x0f) & (xmx_x > x0f)
        # div_det: matches the staged XLA path AND the numpy oracle
        # bitwise (exact-residual division selection; cmd_math.py).
        t_edge = div_det(h_sx - x0f, h_b, bar)
        y_edge = h_sy + bar((h_ey - h_sy) * t_edge)
        edge_in = crosses_left & (y_edge >= y0f) & (y_edge < y0f + thf)
        plain = ((crosses_left & ~edge_in & four)
                 | (~crosses_left & four & (xmn_x < x0f + twf)
                    & (xmx_x > x0f)))
        fill_emit_edge = h_is_fill & ycull & edge_in
        fill_emit_plain = h_is_fill & ycull & plain

        clip_sx = jnp.where(h_b > 0, h_sx, x0f)
        clip_sy = jnp.where(h_b > 0, h_sy, y_edge)
        clip_ey = jnp.where(h_b > 0, y_edge, h_ey)

        # ---- exact stroke tests ----------------------------------------
        st_bcull = ((xmx_y > y0f - h_hw) & (xmn_y < y0f + thf + h_hw)
                    & (xmx_x > x0f - h_hw) & (xmn_x < x0f + twf + h_hw))
        # (== jnp.where(line_item, True, st_bcull) in the XLA path; the
        # boolean-select form trips a Mosaic i8->i1 truncation.)
        st_bcull = ((h_flags & 4) != 0) | st_bcull
        sleft = bar(h_a * (x0f - h_hw))
        sright = bar(h_a * (x0f + twf + h_hw))
        stop_ = bar(h_b * (y0f - h_hw))
        sbot = bar(h_b * (y0f + thf + h_hw))
        z00 = jnp.sign(stop_ + sleft + h_c)
        z01 = jnp.sign(stop_ + sright + h_c)
        z10 = jnp.sign(sbot + sleft + h_c)
        z11 = jnp.sign(sbot + sright + h_c)
        st_four = z00 * z01 + z00 * z10 + z00 * z11 < f32(3.0)
        stroke_emit = h_is_stroke & st_bcull & st_four

        # ---- command slots + entry words -------------------------------
        slot0_valid = fill_emit_edge | stroke_emit
        s0a0 = jnp.where(stroke_emit, h_sx, s00)
        s0a1 = jnp.where(stroke_emit, h_sy, y_edge)
        s0a2 = jnp.where(stroke_emit, h_ex, 0.0)
        s0a3 = jnp.where(stroke_emit, h_ey, 0.0)
        s0a4 = jnp.where(stroke_emit, h_hw, 0.0)
        # Line word 5: the per-segment inverse squared length (gathered;
        # verbatim ops/coarse.py).
        s0a5 = jnp.where(stroke_emit, h_invd, 0.0)

        slot1_valid = fill_emit_edge | fill_emit_plain
        s1a0 = jnp.where(fill_emit_edge, clip_sx, h_sx)
        s1a1 = jnp.where(fill_emit_edge, clip_sy, h_sy)
        # Fill operands [sx, sy, ey, m, K] (verbatim ops/coarse.py; the
        # per-segment m/K words are shared by plain and clipped fills).
        s1a2 = jnp.where(fill_emit_edge, clip_ey, h_ey)
        s1a3 = h_m
        s1a4 = h_K

        z = jnp.zeros((1, BLK), f32)

        def gate0(x):
            return jnp.where(slot0_valid, x, 0.0)

        def gate1(x):
            return jnp.where(slot1_valid, x, 0.0)

        n_cmds = (slot0_valid.astype(jnp.int32)
                  + slot1_valid.astype(jnp.int32))
        tag0 = jnp.where(slot0_valid,
                         jnp.where(stroke_emit, f32(CMD_LINE),
                                   f32(CMD_FILL_EDGE)), 0.0)
        tag1 = jnp.where(slot1_valid, f32(CMD_FILL), 0.0)
        meta = (n_cmds
                + stroke_emit.astype(jnp.int32) * META_CLEAR_BIT
                ).astype(f32)

        live = valid & (n_cmds > 0)
        key = jnp.where(
            live, (h_tile * stride + h_item * 2).astype(f32), jnp.inf)

        # ---- winding-delta emission (round-5 fold) ---------------------
        # One crossing per (fill segment, tile row), from the row's
        # dx == 0 record -- expressions verbatim from ops/coarse.py's
        # staged branch (which carries the rationale).
        bx1 = word_i32(22)
        del_ok = (h_is_fill & (h_a != 0.0) & (h_dx == 0)
                  & (xmn_y <= y0f) & (xmx_y >= y0f) & (bx0 <= bx1))
        x_cross = -(bar(h_b * y0f) + h_c) / h_a
        tx_guess = jnp.floor(x_cross / twf).astype(jnp.int32) + 1
        sign_a = jnp.sign(h_a)

        def dprobe(dtx):
            x0p = (tx_guess + dtx).astype(f32) * twf
            return jnp.sign(bar(h_a * x0p) + bar(h_b * y0f) + h_c) == sign_a

        tx_c = jnp.where(dprobe(-1), tx_guess - 1,
                         jnp.where(dprobe(0), tx_guess,
                                   jnp.where(dprobe(1), tx_guess + 1,
                                             tx_guess + 2)))
        tx_eff = jnp.maximum(tx_c, bx0)
        d_ok = del_ok & (tx_eff <= bx1)
        d_cand = cexcl + (h_ty - by0) * bw + (tx_eff - bx0)
        d_val = jnp.where(d_ok, -sign_a, 0.0)
        d_cand_f = jnp.where(d_ok, d_cand.astype(f32), 0.0)

        def put(k, v):
            out_ref[0, k:k + 1, :] = v

        put(0, tag0)                                  # W_S0_TAG
        put(1, gate0(s0a0))
        put(2, gate0(s0a1))
        put(3, gate0(s0a2))
        put(4, gate0(s0a3))
        put(5, gate0(s0a4))
        put(6, gate0(s0a5))
        put(7, z)
        put(8, tag1)                                  # W_S1_TAG
        put(9, gate1(s1a0))
        put(10, gate1(s1a1))
        put(11, gate1(s1a2))
        put(12, gate1(s1a3))
        put(13, gate1(s1a4))
        put(14, meta)                                 # W_META
        put(15, z)                                    # W_RUN (set later)
        put(K_KEY, key)
        put(K_CAND, h_cand.astype(f32))
        put(K_NCMDS, n_cmds.astype(f32))
        put(K_CEXCL, cexcl.astype(f32))
        put(K_CEND, cand_end.astype(f32))
        put(K_DVAL, d_val)
        put(K_DCAND, d_cand_f)
        put(23, z)


@functools.partial(jax.jit, static_argnames=(
    "cap", "tile_w", "tile_h", "tiles_x", "stride", "interpret"))
def hit_records_fused(seg_rows: jax.Array, counts: jax.Array,
                      excl: jax.Array, total: jax.Array, row0, cap: int, *,
                      tile_w: int, tile_h: int, tiles_x: int, stride: int,
                      interpret: bool = False):
    """Expand per-segment rows into hit records and run the exact tests.

    Args:
      seg_rows: (S, 24) f32 rows -- ops/coarse.py's ``seg_all`` plus the
        bitcast hit_excl word.
      counts/excl: (S,) int32 hit counts and their exclusive cumsum.
      total: () int32 live hit count (= excl[-1] + counts[-1]).
      row0: traced int32 first tile row of the slab.
      cap: static hit capacity.

    Returns dict with per-hit vectors of length >= cap (trim to cap):
      rows (cap_pad, 16) f32 entry words, key, h_cand, n_cmds, cexcl,
      cand_end.
    """
    S, W = seg_rows.shape
    assert W == SEG_WORDS
    cap_pad = ((cap + BLK - 1) // BLK) * BLK
    assert cap_pad < 2 ** 24

    u = jax.lax.bitcast_convert_type(seg_rows, jnp.uint32)
    quarters = jnp.stack([(u >> 24).astype(jnp.bfloat16),
                          ((u >> 16) & 0xFF).astype(jnp.bfloat16),
                          ((u >> 8) & 0xFF).astype(jnp.bfloat16),
                          (u & 0xFF).astype(jnp.bfloat16)], axis=2)
    rows_f = quarters.reshape(S, 4 * W)

    s_pad = (S // WIN + 2) * WIN
    pad = s_pad - S
    # Transposed quarter planes: (QROWS, S_pad); hits ride lanes
    # downstream.
    rows_T = jnp.pad(jnp.pad(rows_f, ((0, pad), (0, 0))).T,
                     ((0, QROWS - 4 * W), (0, 0)))

    dead = jnp.float32(cap_pad)
    bounds = jnp.stack(
        [jnp.where(counts > 0, excl.astype(jnp.float32), dead),
         jnp.where(counts > 0, (excl + counts).astype(jnp.float32), dead)])
    bounds_p = jnp.pad(bounds, ((0, 6), (0, pad)))
    bounds_p = bounds_p.at[0, S:].set(dead)

    lo, n_sub = _precompute(excl, counts, cap_pad, s_pad)

    kernel = functools.partial(
        _hitfuse_kernel, tile_w=tile_w, tile_h=tile_h, tiles_x=tiles_x,
        stride=stride, cap_pad=cap_pad, interpret=interpret)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(cap_pad // BLK,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM),
                  pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec((1, OUT_ROWS, BLK),
                               lambda b, lo, ns, t, r0: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((3, QROWS, WIN), jnp.bfloat16),
            pltpu.VMEM((3, 8, WIN), jnp.float32),
            pltpu.VMEM((QROWS, BLK), jnp.float32),
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

    rows = out[:, :16, :].transpose(0, 2, 1).reshape(cap_pad, 16)[:cap]

    def col(k):
        return out[:, k, :].reshape(cap_pad)[:cap]

    return {"rows": rows, "key": col(K_KEY), "h_cand": col(K_CAND),
            "n_cmds": col(K_NCMDS), "cexcl": col(K_CEXCL),
            "cand_end": col(K_CEND), "d_val": col(K_DVAL),
            "d_cand": col(K_DCAND)}
