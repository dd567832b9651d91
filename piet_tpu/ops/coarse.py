"""XLA coarse rasterizer: sort-based device binning (Scene -> PTCL arrays).

TPU-native replacement for the reference's ``tileKernel``
(PietRender.metal:160-454).  The reference's core parallel pattern is a SIMT
cooperative ballot: threads vote on surviving segments in a threadgroup
bitmap, then serially walk set bits (PietRender.metal:191-213,254-305).  That
idiom exists to skip work under divergence; TPU has no divergence, so the
same O(hits) goal is reached with dense vectorized math + expansion + one
sort (SURVEY.md section 7, translation decision 4):

  1. segment derivation  -- every item's segments as flat arrays (gathers)
  2. rect expansion      -- per segment, the conservative rectangle of tiles
                            it may emit commands into; expanded to (segment,
                            tile) *hit records* via cumsum + searchsorted
  3. exact per-record tests -- the reference's per-tile f32 sign tests,
                            evaluated identically (see raster/cpu_tiler.py),
                            emitting <= 2 command slots per record
  4. winding deltas      -- per (fill segment, tile row) crossing records;
                            scatter + per-row prefix-sum gives each
                            (item, tile) candidate its integer backdrop
                            (replaces the per-tile left-ray accumulation,
                            PietRender.metal:331-333)
  5. candidates          -- per (item, tile-in-bbox) records that emit the
                            trailing CmdDrawFill/CmdSolid/CmdStroke/CmdCircle
  6. one stable sort     -- key (tile, item, class, segment) restores
                            painter's order per tile
  7. bail analysis       -- per-tile last-opaque-solid / last-clearing-draw
                            positions reproduce the TileEncoder cursor-reset
                            optimization (PietRender.metal:127-151) without
                            rewriting a stream
  8. scatter             -- dense (T, CAP) tag/arg arrays + counts + solid +
                            overflow (overflow *detected*, unlike the
                            reference's silent 4096-byte cap)

Exactness: every geometric test is evaluated in f32 with the same expressions
as the CPU golden tiler, and expansion rectangles are exact supersets
(tile sizes are powers of two, so the / and * by tile dims are exact), so the
resulting PTCL is command-for-command identical to the oracle -- tested in
tests/test_coarse.py.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..raster.ptcl import (ARG_WORDS, CMD_CIRCLE, CMD_DRAW_FILL, CMD_FILL,
                           CMD_FILL_EDGE, CMD_LINE, CMD_SOLID, CMD_STROKE)
from ..scene.scene import TAG_CIRCLE, TAG_FILL, TAG_LINE, TAG_POLY

I32_MAX = jnp.int32(2**31 - 1)


class DeviceScene(NamedTuple):
    """Padded device-resident scene arrays (see renderer/renderer.py for
    host-side preparation; colors are pre-decoded on host so the CPU oracle
    and the device agree bit-for-bit on operand values)."""
    tags: jax.Array        # (NI,) int32, 0 = padding
    colors_u32: jax.Array  # (NI,) uint32 logical 0xRRGGBBAA
    colors_lin: jax.Array  # (NI, 4) f32 linear r,g,b + alpha
    widths: jax.Array      # (NI,) f32
    bboxes: jax.Array      # (NI, 4) int32 quantized
    pt_offset: jax.Array   # (NI,) int32
    n_pts: jax.Array       # (NI,) int32
    points: jax.Array      # (NP, 2) f32
    n_items: jax.Array     # () int32


class CoarseOutput(NamedTuple):
    tags: jax.Array      # (T, CAP) int32
    args: jax.Array      # (T, CAP * 8) f32
    counts: jax.Array    # (T,) int32
    solid: jax.Array     # (T,) uint32 bail color, 0 = none
    overflow: jax.Array  # (T,) int32 dropped commands
    diag: dict           # capacity diagnostics (record totals vs caps)


def _exclusive_cumsum(x):
    c = jnp.cumsum(x)
    return c - x, c  # (exclusive, inclusive)


def _expand(counts: jax.Array, cap: int) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Ragged-range expansion: sources with ``counts[i]`` slots each are laid
    out consecutively; returns (src_index, local_index, valid) for ``cap``
    output slots.  The standard cumsum + searchsorted idiom."""
    excl, incl = _exclusive_cumsum(counts)
    total = incl[-1] if counts.size else jnp.int32(0)
    idx = jnp.arange(cap, dtype=jnp.int32)
    src = jnp.searchsorted(incl, idx, side="right").astype(jnp.int32)
    valid = idx < total
    src_c = jnp.minimum(src, counts.shape[0] - 1)
    local = idx - excl[src_c]
    return src_c, local, valid


def _sign(x):
    return jnp.sign(x)


def _bar(x):
    """FMA-contraction barrier.

    The CPU golden tiler (numpy) rounds every multiply and add separately;
    XLA backends may contract mul+add chains into FMAs, perturbing the sign
    tests and edge intercepts by 1 ulp -- enough to flip a command at an
    exact tile boundary.  Materializing each product through an
    optimization_barrier forces separate rounding, making the device PTCL
    bit-identical to the oracle (verified in tests/test_coarse.py).
    """
    return jax.lax.optimization_barrier(x)


def _item_tile_rect(bboxes, tw: int, th: int, tiles_x: int, tiles_y: int,
                    active, row0):
    """Quantized item bbox -> inclusive tile rect, exactly the reference hit
    test (PietRender.metal:214) solved for tx/ty; empty if offscreen.

    ``row0``/``tiles_y`` window the rect to tile rows [row0, row0+tiles_y)
    -- the row-sharding hook (parallel/sharding.py): each shard computes
    exactly the commands of its slab, in absolute pixel coordinates, so
    sharded and unsharded PTCLs are identical."""
    x0 = jnp.maximum(bboxes[:, 0] // tw, 0)
    y0 = jnp.maximum(bboxes[:, 1] // th, row0)
    x1 = jnp.minimum(bboxes[:, 2] // tw, tiles_x - 1)
    y1 = jnp.minimum(bboxes[:, 3] // th, row0 + tiles_y - 1)
    w = jnp.where(active, jnp.maximum(x1 - x0 + 1, 0), 0)
    h = jnp.where(active, jnp.maximum(y1 - y0 + 1, 0), 0)
    return x0, y0, x1, y1, w, h


def coarse_rasterize(scene: DeviceScene, *, tiles_x: int, tiles_y: int,
                     tile_w: int, tile_h: int, cmd_capacity: int,
                     max_segments: int, max_hits: int, max_candidates: int,
                     max_deltas: int, row0=0,
                     debug_stage: str = "") -> CoarseOutput:
    """row0: first tile row of this shard's slab (traced OK); tiles_y is
    the number of LOCAL rows.  Defaults cover the whole viewport."""
    NI = scene.tags.shape[0]
    row0 = jnp.int32(row0)
    n_tiles = tiles_x * tiles_y
    twf = jnp.float32(tile_w)
    thf = jnp.float32(tile_h)
    f32 = jnp.float32

    item_ids = jnp.arange(NI, dtype=jnp.int32)
    active = (item_ids < scene.n_items) & (scene.tags > 0)
    tags = jnp.where(active, scene.tags, 0)

    # ---- item bbox tile rects + candidate expansion -------------------
    bx0, by0, bx1, by1, bw, bh = _item_tile_rect(
        scene.bboxes, tile_w, tile_h, tiles_x, tiles_y, active, row0)
    cand_counts = bw * bh
    cand_excl, cand_incl = _exclusive_cumsum(cand_counts)
    n_cand = cand_incl[-1]
    cand_item, cand_local, cand_valid = _expand(cand_counts, max_candidates)
    cand_w = jnp.maximum(bw[cand_item], 1)
    cand_ty = by0[cand_item] + cand_local // cand_w
    cand_tx = bx0[cand_item] + cand_local % cand_w
    cand_tile = (cand_ty - row0) * tiles_x + cand_tx

    # ---- segment derivation ------------------------------------------
    # Fill items: n wrap-around segments; poly: n-1; line: 1; circle: 0.
    seg_counts = jnp.where(
        tags == TAG_FILL, scene.n_pts,
        jnp.where(tags == TAG_POLY, jnp.maximum(scene.n_pts - 1, 0),
                  jnp.where(tags == TAG_LINE, 1, 0)))
    seg_excl, seg_incl = _exclusive_cumsum(seg_counts)
    n_segs = seg_incl[-1]
    seg_item, seg_local, seg_valid = _expand(seg_counts, max_segments)
    s_tag = tags[seg_item]
    s_npts = scene.n_pts[seg_item]
    i0 = scene.pt_offset[seg_item] + seg_local
    nxt = jnp.where((s_tag == TAG_FILL) & (seg_local + 1 == s_npts),
                    0, seg_local + 1)
    i1 = scene.pt_offset[seg_item] + nxt
    np_max = scene.points.shape[0] - 1
    p0 = scene.points[jnp.clip(i0, 0, np_max)]
    p1 = scene.points[jnp.clip(i1, 0, np_max)]
    sx, sy = p0[:, 0], p0[:, 1]
    ex, ey = p1[:, 0], p1[:, 1]
    a = ey - sy
    b = sx - ex
    c = -(_bar(a * sx) + _bar(b * sy))
    xmn = jnp.minimum(p0, p1)
    xmx = jnp.maximum(p0, p1)
    s_hw = f32(0.5) * scene.widths[seg_item] + f32(0.5)
    is_fill_seg = seg_valid & (s_tag == TAG_FILL)
    is_stroke_seg = seg_valid & ((s_tag == TAG_POLY) | (s_tag == TAG_LINE))

    # ---- per-segment emission rects ----------------------------------
    # Fill: exact solve of the reference's x/y-extent conditions (tile dims
    # are powers of two so // and f32 / are exact).  Stroke: inflated rect
    # with +-1 slop (the inflation adds round in f32; the exact per-record
    # cull re-filters).  Line items: the item bbox rect (the reference
    # applies no segment-level cull for single lines, :223-247).
    def _range_x_fill():
        lo = jnp.floor(xmn[:, 0] / twf).astype(jnp.int32)
        hi = jnp.ceil(xmx[:, 0] / twf).astype(jnp.int32) - 1
        return lo, hi

    def _range_y_fill():
        lo = jnp.floor(xmn[:, 1] / thf).astype(jnp.int32)
        hi = jnp.floor(xmx[:, 1] / thf).astype(jnp.int32)
        return lo, hi

    fx_lo, fx_hi = _range_x_fill()
    fy_lo, fy_hi = _range_y_fill()
    st_x_lo = jnp.floor((xmn[:, 0] - s_hw) / twf).astype(jnp.int32) - 1
    st_x_hi = jnp.ceil((xmx[:, 0] + s_hw) / twf).astype(jnp.int32)
    st_y_lo = jnp.floor((xmn[:, 1] - s_hw) / thf).astype(jnp.int32) - 1
    st_y_hi = jnp.ceil((xmx[:, 1] + s_hw) / thf).astype(jnp.int32)

    is_line_item = s_tag == TAG_LINE
    r_x_lo = jnp.where(is_fill_seg, fx_lo,
                       jnp.where(is_line_item, bx0[seg_item], st_x_lo))
    r_x_hi = jnp.where(is_fill_seg, fx_hi,
                       jnp.where(is_line_item, bx1[seg_item], st_x_hi))
    r_y_lo = jnp.where(is_fill_seg, fy_lo,
                       jnp.where(is_line_item, by0[seg_item], st_y_lo))
    r_y_hi = jnp.where(is_fill_seg, fy_hi,
                       jnp.where(is_line_item, by1[seg_item], st_y_hi))
    # Clip to the item's bbox rect (the reference's per-tile `hit` gate).
    r_x_lo = jnp.maximum(r_x_lo, bx0[seg_item])
    r_x_hi = jnp.minimum(r_x_hi, bx1[seg_item])
    r_y_lo = jnp.maximum(r_y_lo, by0[seg_item])
    r_y_hi = jnp.minimum(r_y_hi, by1[seg_item])
    r_w = jnp.maximum(r_x_hi - r_x_lo + 1, 0)
    r_h = jnp.maximum(r_y_hi - r_y_lo + 1, 0)
    hit_counts = jnp.where(seg_valid & (seg_counts[seg_item] > 0),
                           r_w * r_h, 0)

    hit_excl, hit_incl = _exclusive_cumsum(hit_counts)
    n_hits = hit_incl[-1]
    hit_seg, hit_local, hit_valid = _expand(hit_counts, max_hits)
    h_w = jnp.maximum(r_w[hit_seg], 1)
    h_ty = r_y_lo[hit_seg] + hit_local // h_w
    h_tx = r_x_lo[hit_seg] + hit_local % h_w
    h_item = seg_item[hit_seg]
    h_tile = (h_ty - row0) * tiles_x + h_tx
    h_cand = (cand_excl[h_item]
              + (h_ty - by0[h_item]) * jnp.maximum(bw[h_item], 1)
              + (h_tx - bx0[h_item]))

    # ---- exact per-record tests (f32, identical to cpu_tiler.py) ------
    x0f = h_tx.astype(f32) * twf
    y0f = h_ty.astype(f32) * thf
    hs, he = hit_seg, None
    h_sx, h_sy, h_ex, h_ey = sx[hs], sy[hs], ex[hs], ey[hs]
    h_a, h_b, h_c = a[hs], b[hs], c[hs]
    h_xmn, h_xmx = xmn[hs], xmx[hs]
    h_is_fill = is_fill_seg[hs] & hit_valid
    h_is_stroke = is_stroke_seg[hs] & hit_valid

    # Fill tests (PietRender.metal:307-354).
    ycull = (h_xmx[:, 1] >= y0f) & (h_xmn[:, 1] < y0f + thf)
    left = _bar(h_a * x0f)
    right = _bar(h_a * (x0f + twf))
    ytop = jnp.maximum(y0f, h_xmn[:, 1])
    ybot = jnp.minimum(y0f + thf, h_xmx[:, 1])
    top = _bar(h_b * ytop)
    bot = _bar(h_b * ybot)
    s00 = _sign(top + left + h_c)
    s01 = _sign(top + right + h_c)
    s10 = _sign(bot + left + h_c)
    s11 = _sign(bot + right + h_c)
    four = s00 * s01 + s00 * s10 + s00 * s11 < f32(3.0)
    crosses_left = (h_xmn[:, 0] < x0f) & (h_xmx[:, 0] > x0f)
    t_edge = (h_sx - x0f) / h_b
    y_edge = h_sy + _bar((h_ey - h_sy) * t_edge)
    edge_in = crosses_left & (y_edge >= y0f) & (y_edge < y0f + thf)
    plain = ((crosses_left & ~edge_in & four)
             | (~crosses_left & four & (h_xmn[:, 0] < x0f + twf)
                & (h_xmx[:, 0] > x0f)))

    fill_emit_edge = h_is_fill & ycull & edge_in
    fill_emit_plain = h_is_fill & ycull & plain

    # Clipped fill coords for the left-edge crossing (:339-344).
    clip_sx = jnp.where(h_b > 0, h_sx, x0f)
    clip_sy = jnp.where(h_b > 0, h_sy, y_edge)
    clip_ex = jnp.where(h_b > 0, x0f, h_ex)
    clip_ey = jnp.where(h_b > 0, y_edge, h_ey)

    # Stroke tests (:411-435 for polys; :223-247 for lines -- the line case
    # has no segment bbox cull, matching the reference).
    h_hw = s_hw[hs]
    st_bcull = ((h_xmx[:, 1] > y0f - h_hw) & (h_xmn[:, 1] < y0f + thf + h_hw)
                & (h_xmx[:, 0] > x0f - h_hw) & (h_xmn[:, 0] < x0f + twf + h_hw))
    st_bcull = jnp.where(is_line_item[hs], True, st_bcull)
    sleft = _bar(h_a * (x0f - h_hw))
    sright = _bar(h_a * (x0f + twf + h_hw))
    stop = _bar(h_b * (y0f - h_hw))
    sbot = _bar(h_b * (y0f + thf + h_hw))
    z00 = _sign(stop + sleft + h_c)
    z01 = _sign(stop + sright + h_c)
    z10 = _sign(sbot + sleft + h_c)
    z11 = _sign(sbot + sright + h_c)
    st_four = z00 * z01 + z00 * z10 + z00 * z11 < f32(3.0)
    stroke_emit = h_is_stroke & st_bcull & st_four

    # Per-record command slots: slot0 = FillEdge | Line, slot1 = Fill.
    slot0_valid = fill_emit_edge | stroke_emit
    slot0_tag = jnp.where(stroke_emit, CMD_LINE, CMD_FILL_EDGE)
    slot0_args = jnp.zeros((max_hits, ARG_WORDS), f32)
    slot0_args = slot0_args.at[:, 0].set(
        jnp.where(stroke_emit, h_sx, s00))
    slot0_args = slot0_args.at[:, 1].set(
        jnp.where(stroke_emit, h_sy, y_edge))
    slot0_args = slot0_args.at[:, 2].set(jnp.where(stroke_emit, h_ex, 0))
    slot0_args = slot0_args.at[:, 3].set(jnp.where(stroke_emit, h_ey, 0))

    slot1_valid = fill_emit_edge | fill_emit_plain
    slot1_tag = jnp.full((max_hits,), CMD_FILL, jnp.int32)
    f1_sx = jnp.where(fill_emit_edge, clip_sx, h_sx)
    f1_sy = jnp.where(fill_emit_edge, clip_sy, h_sy)
    f1_ex = jnp.where(fill_emit_edge, clip_ex, h_ex)
    f1_ey = jnp.where(fill_emit_edge, clip_ey, h_ey)
    slot1_args = jnp.zeros((max_hits, ARG_WORDS), f32)
    slot1_args = slot1_args.at[:, 0].set(f1_sx)
    slot1_args = slot1_args.at[:, 1].set(f1_sy)
    slot1_args = slot1_args.at[:, 2].set(f1_ex)
    slot1_args = slot1_args.at[:, 3].set(f1_ey)

    hit_n_cmds = slot0_valid.astype(jnp.int32) + slot1_valid.astype(jnp.int32)
    if debug_stage == "tests":
        return (slot0_args.sum() + slot1_args.sum() + hit_n_cmds.sum())


    # Per-candidate emitted-command count (drives anyFill/anyStroke).
    cand_emit = jax.ops.segment_sum(
        hit_n_cmds, jnp.where(hit_valid, h_cand, max_candidates),
        num_segments=max_candidates + 1)[:max_candidates]

    # ---- winding deltas (backdrop) ------------------------------------
    # Rows whose top edge y0 lies in [ymin, ymax] (see cpu_tiler backdrop
    # mask); exact for power-of-two tile heights.
    d_y_lo = jnp.maximum(jnp.ceil(xmn[:, 1] / thf).astype(jnp.int32), row0)
    d_y_hi = jnp.minimum(jnp.floor(xmx[:, 1] / thf).astype(jnp.int32),
                         row0 + tiles_y - 1)
    delta_counts = jnp.where(is_fill_seg & (a != 0),
                             jnp.maximum(d_y_hi - d_y_lo + 1, 0), 0)
    del_excl, del_incl = _exclusive_cumsum(delta_counts)
    n_deltas = del_incl[-1]
    del_seg, del_local, del_valid = _expand(delta_counts, max_deltas)
    d_ty = d_y_lo[del_seg] + del_local
    d_y0 = d_ty.astype(f32) * thf
    d_a, d_b, d_c = a[del_seg], b[del_seg], c[del_seg]
    d_item = seg_item[del_seg]
    # Crossing column: first tx with sign(a*x0 + b*y0 + c) == sign(a).  The
    # f32-evaluated expression is monotone in x0, so probe +-2 tiles around
    # the analytic crossing to match the per-tile sign test bit-for-bit.
    x_cross = -(_bar(d_b * d_y0) + d_c) / d_a
    tx_guess = jnp.floor(x_cross / twf).astype(jnp.int32) + 1
    sign_a = _sign(d_a)

    def probe(dtx):
        x0p = (tx_guess + dtx).astype(f32) * twf
        return _sign(_bar(d_a * x0p) + _bar(d_b * d_y0) + d_c) == sign_a

    p_m1 = probe(-1)
    p_0 = probe(0)
    p_p1 = probe(1)
    tx_c = jnp.where(p_m1, tx_guess - 1,
                     jnp.where(p_0, tx_guess,
                               jnp.where(p_p1, tx_guess + 1, tx_guess + 2)))
    d_value = -sign_a  # the reference's `backdrop -= s00` with s00 == sign(a)
    # Scatter into candidate slots: clamp the crossing column into the item's
    # bbox rect row; drop rows outside the rect or crossings right of it.
    in_rect_row = (d_ty >= by0[d_item]) & (d_ty <= by1[d_item])
    tx_eff = jnp.maximum(tx_c, bx0[d_item])
    d_ok = del_valid & in_rect_row & (tx_eff <= bx1[d_item])
    d_cand = (cand_excl[d_item]
              + (d_ty - by0[d_item]) * jnp.maximum(bw[d_item], 1)
              + (tx_eff - bx0[d_item]))
    delta_scatter = jax.ops.segment_sum(
        jnp.where(d_ok, d_value, 0.0),
        jnp.where(d_ok, d_cand, max_candidates),
        num_segments=max_candidates + 1)[:max_candidates]
    # Per-(item, row) prefix sum along tx: candidates are row-major per item,
    # so subtract the running total at each row start.
    csum = jnp.cumsum(delta_scatter)
    cand_row_start = (cand_excl[cand_item]
                      + (cand_ty - by0[cand_item]) * jnp.maximum(bw[cand_item], 1))
    start_base = jnp.where(cand_row_start > 0, csum[cand_row_start - 1], 0.0)
    backdrop = csum[jnp.minimum(
        cand_row_start + (cand_tx - bx0[cand_item]), max_candidates - 1)] - start_base
    if debug_stage == "deltas":
        return (backdrop.sum() + hit_n_cmds.sum() + slot0_args.sum() + slot1_args.sum())


    # ---- candidate tail commands --------------------------------------
    c_tag_item = tags[cand_item]
    c_color_lin = scene.colors_lin[cand_item]
    c_color_u32 = scene.colors_u32[cand_item]
    c_any = cand_emit > 0
    c_backdrop_nz = backdrop != 0.0

    is_circle = cand_valid & (c_tag_item == TAG_CIRCLE)
    is_drawfill = cand_valid & (c_tag_item == TAG_FILL) & c_any
    is_solid = cand_valid & (c_tag_item == TAG_FILL) & ~c_any & c_backdrop_nz
    is_stroke = cand_valid & ((c_tag_item == TAG_POLY)
                              | (c_tag_item == TAG_LINE)) & c_any

    cand_cmd_valid = is_circle | is_drawfill | is_solid | is_stroke
    cand_tag = jnp.where(
        is_circle, CMD_CIRCLE,
        jnp.where(is_drawfill, CMD_DRAW_FILL,
                  jnp.where(is_solid, CMD_SOLID, CMD_STROKE)))
    cbb = scene.bboxes[cand_item].astype(f32)
    chw = f32(0.5) * scene.widths[cand_item]
    cand_args = jnp.zeros((max_candidates, ARG_WORDS), f32)
    a0 = jnp.where(is_circle, cbb[:, 0],
                   jnp.where(is_drawfill, backdrop,
                             jnp.where(is_stroke, chw, c_color_lin[:, 0])))
    a1 = jnp.where(is_circle, cbb[:, 1],
                   jnp.where(is_solid, c_color_lin[:, 1], c_color_lin[:, 0]))
    a2 = jnp.where(is_circle, cbb[:, 2],
                   jnp.where(is_solid, c_color_lin[:, 2], c_color_lin[:, 1]))
    a3 = jnp.where(is_circle, cbb[:, 3],
                   jnp.where(is_solid, c_color_lin[:, 3], c_color_lin[:, 2]))
    a4 = jnp.where(is_solid | is_circle, 0.0, c_color_lin[:, 3])
    cand_args = cand_args.at[:, 0].set(a0)
    cand_args = cand_args.at[:, 1].set(a1)
    cand_args = cand_args.at[:, 2].set(a2)
    cand_args = cand_args.at[:, 3].set(a3)
    cand_args = cand_args.at[:, 4].set(a4)

    is_opaque_solid = is_solid & ((c_color_u32 & 0xFF) == 0xFF)
    # Clearing commands (reset the bail state): Circle, Line, Stroke,
    # DrawFill (TileEncoder, PietRender.metal:81,90,99,124).
    cand_is_clear = is_circle | is_drawfill | is_stroke
    if debug_stage == "cands":
        return (backdrop.sum() + cand_args.sum() + hit_n_cmds.sum() + slot0_args.sum() + slot1_args.sum())


    # ---- global sort: two-key 32-bit lexicographic sort ---------------
    # key1 = tile * (NI+1) + item  (painter's order per tile);
    # key2 = class * (S+1) + seg   (segment order within an item, tail last).
    # Keeping keys in int32 avoids x64 mode; both fit comfortably.
    hit_key1 = h_tile * (NI + 1) + h_item
    hit_key2 = hit_seg  # class 0
    hit_live = hit_valid & (hit_n_cmds > 0)
    hit_key1 = jnp.where(hit_live, hit_key1, I32_MAX)
    cand_key1 = jnp.where(cand_cmd_valid, cand_tile * (NI + 1) + cand_item,
                          I32_MAX)
    cand_key2 = jnp.full((max_candidates,), max_segments + 1, jnp.int32)

    all_key1 = jnp.concatenate([hit_key1, cand_key1])
    all_key2 = jnp.concatenate([hit_key2, cand_key2])
    E = all_key1.shape[0]
    order_idx = jnp.arange(E, dtype=jnp.int32)
    sorted_key1, _, sorted_idx = jax.lax.sort(
        (all_key1, all_key2, order_idx), dimension=0, num_keys=2,
        is_stable=True)
    if debug_stage == "sort":
        return (sorted_key1.sum() + sorted_idx.sum() + backdrop.sum() + cand_args.sum() + slot0_args.sum() + slot1_args.sum())


    live = sorted_key1 < I32_MAX
    src_is_hit = sorted_idx < max_hits
    hidx = jnp.minimum(sorted_idx, max_hits - 1)
    cidx = jnp.maximum(sorted_idx - max_hits, 0)

    e_tile = jnp.where(live, sorted_key1 // (NI + 1), n_tiles)
    e_ncmds = jnp.where(
        live, jnp.where(src_is_hit, hit_n_cmds[hidx], 1), 0)
    e_is_opaque = live & ~src_is_hit & is_opaque_solid[cidx]
    e_is_clear = live & ~src_is_hit & cand_is_clear[cidx]
    # Hit-record clearing cmds: CmdLine clears bail (:90); fill coverage
    # commands do not (:102-117).
    e_is_clear = e_is_clear | (live & src_is_hit & stroke_emit[hidx])

    # In-tile command positions (exclusive scan of command counts).
    cpos_excl, _ = _exclusive_cumsum(e_ncmds)
    tile_first_entry = jnp.searchsorted(
        e_tile, jnp.arange(n_tiles, dtype=jnp.int32), side="left")
    tile_last_entry = jnp.searchsorted(
        e_tile, jnp.arange(n_tiles, dtype=jnp.int32), side="right")
    safe_first = jnp.minimum(tile_first_entry, E - 1)
    tile_cmd_base = jnp.where(
        tile_first_entry < tile_last_entry, cpos_excl[safe_first], 0)
    tile_cmd_total = jnp.where(
        tile_first_entry < tile_last_entry,
        cpos_excl[jnp.minimum(tile_last_entry - 1, E - 1)]
        + e_ncmds[jnp.minimum(tile_last_entry - 1, E - 1)]
        - tile_cmd_base, 0)
    e_pos = cpos_excl - tile_cmd_base[jnp.minimum(e_tile, n_tiles - 1)]
    if debug_stage == "pos":
        return (e_pos.sum() + sorted_idx.sum() + backdrop.sum() + cand_args.sum() + slot0_args.sum() + slot1_args.sum())


    # ---- bail analysis ------------------------------------------------
    seg_ids = jnp.minimum(e_tile, n_tiles)
    last_opaque = jax.ops.segment_max(
        jnp.where(e_is_opaque, e_pos, -1), seg_ids,
        num_segments=n_tiles + 1)[:n_tiles]
    last_opaque = jnp.maximum(last_opaque, -1)
    last_clear = jax.ops.segment_max(
        jnp.where(e_is_clear, e_pos, -2), seg_ids,
        num_segments=n_tiles + 1)[:n_tiles]
    last_clear = jnp.maximum(last_clear, -2)
    bail = last_clear < last_opaque

    # Bail color: the opaque solid whose position equals last_opaque.  Its
    # in-tile position is unique, so a second segment_max over matching
    # entry indices recovers the entry without 64-bit arithmetic.
    is_best = e_is_opaque & (e_pos == last_opaque[jnp.minimum(
        e_tile, n_tiles - 1)])
    best_entry = jax.ops.segment_max(
        jnp.where(is_best, jnp.arange(E, dtype=jnp.int32), -1), seg_ids,
        num_segments=n_tiles + 1)[:n_tiles]
    best_entry = jnp.maximum(best_entry, 0)
    best_color = c_color_u32[cidx[best_entry]]
    solid_color = jnp.where(
        bail, jnp.where(last_opaque >= 0, best_color,
                        jnp.uint32(0xFFFFFFFF)), jnp.uint32(0))

    # ---- scatter into (T, CAP) ---------------------------------------
    start = jnp.where(bail, jnp.int32(0),
                      jnp.where(last_opaque >= 0, last_opaque, 0))
    count_post = jnp.where(bail, 0, tile_cmd_total - start)
    if debug_stage == "bail":
        return (count_post.sum() + e_pos.sum() + sorted_idx.sum() + backdrop.sum() + cand_args.sum() + slot0_args.sum() + slot1_args.sum())

    overflow = jnp.maximum(count_post - cmd_capacity, 0)
    counts = jnp.minimum(count_post, cmd_capacity)

    out_tags = jnp.zeros((n_tiles * cmd_capacity + 1,), jnp.int32)
    out_args = jnp.zeros((n_tiles * cmd_capacity + 1, ARG_WORDS), f32)

    e_tile_c = jnp.minimum(e_tile, n_tiles - 1)
    rel = e_pos - start[e_tile_c]

    def scatter_slot(out_tags, out_args, slot_off, s_valid, s_tag, s_args):
        pos = rel + slot_off
        ok = live & s_valid & (pos >= 0) & (pos < counts[e_tile_c]) \
            & ~bail[e_tile_c]
        # Bailed tiles keep only nothing (counts == 0), handled by `ok`.
        flat = jnp.where(ok, e_tile_c * cmd_capacity + pos,
                         n_tiles * cmd_capacity)
        out_tags = out_tags.at[flat].set(jnp.where(ok, s_tag, 0),
                                         mode="drop")
        out_args = out_args.at[flat].set(
            jnp.where(ok[:, None], s_args, 0.0), mode="drop")
        return out_tags, out_args

    # Entry slot 0.
    e_slot0_valid = jnp.where(src_is_hit, slot0_valid[hidx],
                              cand_cmd_valid[cidx])
    e_slot0_tag = jnp.where(src_is_hit, slot0_tag[hidx], cand_tag[cidx])
    e_slot0_args = jnp.where(src_is_hit[:, None], slot0_args[hidx],
                             cand_args[cidx])
    # A fill hit whose slot0 (FillEdge) is invalid but slot1 (Fill) valid
    # must place the Fill at position rel+0, not rel+1.
    e_s1_valid = src_is_hit & slot1_valid[hidx]
    s1_off = jnp.where(e_slot0_valid, 1, 0)
    e_slot0_valid_eff = jnp.where(e_slot0_valid, True, False)
    out_tags, out_args = scatter_slot(
        out_tags, out_args, 0,
        e_slot0_valid_eff | (e_s1_valid & ~e_slot0_valid),
        jnp.where(e_slot0_valid, e_slot0_tag, slot1_tag[hidx]),
        jnp.where(e_slot0_valid[:, None], e_slot0_args, slot1_args[hidx]))
    out_tags, out_args = scatter_slot(
        out_tags, out_args, 1, e_s1_valid & e_slot0_valid,
        slot1_tag[hidx], slot1_args[hidx])

    diag = {
        "n_segments": n_segs, "n_hits": n_hits, "n_candidates": n_cand,
        "n_deltas": n_deltas,
        "seg_overflow": jnp.maximum(n_segs - max_segments, 0),
        "hit_overflow": jnp.maximum(n_hits - max_hits, 0),
        "cand_overflow": jnp.maximum(n_cand - max_candidates, 0),
        "delta_overflow": jnp.maximum(n_deltas - max_deltas, 0),
    }
    return CoarseOutput(
        tags=out_tags[:-1].reshape(n_tiles, cmd_capacity),
        args=out_args[:-1].reshape(n_tiles, cmd_capacity * ARG_WORDS),
        counts=counts, solid=solid_color, overflow=overflow, diag=diag)
