"""Pallas fine rasterizer: the device-side PTCL interpreter.

TPU-native reimplementation of the reference's ``renderKernel``
(PietRender.metal:457-566).  Mapping of the parallelism:

* reference: one GPU thread per pixel, threadgroup = one 16x16 tile; the
  command list is interpreted per-thread with scalar state.
* here: one Pallas grid step per tile; the per-pixel state (rgb / df /
  signed-area) lives as (tile_h, tile_w) f32 VMEM arrays -- with the default
  16x128 tile exactly two VPU vregs each -- and every command is one
  scalar-driven vector operation over the whole tile.  The sequential
  command loop is a ``lax.fori_loop`` (painter's order is a hard data
  dependency) with a 7-way ``lax.switch`` on the tag.

Command words are staged in SMEM (scalar memory) because they drive control
flow and scalar operands -- the TPU analog of the reference's per-thread
``Cmd_read`` from a device buffer (PietRender.metal:475).

The math matches raster/cpu_fine.py bit-for-bit (f32 policy; see that
module's docstring for the precision rationale).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..raster.ptcl import ARG_WORDS

DF_INIT = 1e9


def _saturate(v):
    return jnp.clip(v, 0.0, 1.0)


def _fine_kernel(counts_ref, tags_ref, args_ref, out_ref, *, tile_h: int,
                 tile_w: int, cmd_capacity: int):
    ty = pl.program_id(0)
    tx = pl.program_id(1)
    x0 = (tx * tile_w).astype(jnp.float32)
    y0 = (ty * tile_h).astype(jnp.float32)
    X = x0 + jax.lax.broadcasted_iota(jnp.float32, (tile_h, tile_w), 1)
    Y = y0 + jax.lax.broadcasted_iota(jnp.float32, (tile_h, tile_w), 0)

    def arg(i, k):
        return args_ref[0, i * ARG_WORDS + k]

    def cmd_circle(i, rgb, df, area):
        bx0, by0, bx1, by1 = arg(i, 0), arg(i, 1), arg(i, 2), arg(i, 3)
        cx = bx0 + 0.5 * (bx1 - bx0)
        cy = by0 + 0.5 * (by1 - by0)
        r = jnp.sqrt((X - cx) ** 2 + (Y - cy) ** 2)
        circle_r = jnp.minimum(cx - bx0, cy - by0)
        alpha = _saturate(circle_r - r)
        # Blend toward black: color is never encoded for circles
        # (PietRender.metal:488-492).
        return rgb * (1.0 - alpha)[None], df, area

    def cmd_line(i, rgb, df, area):
        sx, sy, ex, ey = arg(i, 0), arg(i, 1), arg(i, 2), arg(i, 3)
        lvx, lvy = ex - sx, ey - sy
        dpx, dpy = X - sx, Y - sy
        denom = lvx * lvx + lvy * lvy
        # Degenerate segments render as dots (t = 0); see cpu_fine.py.
        t = jnp.where(denom > 0.0,
                      _saturate((lvx * dpx + lvy * dpy) / denom), 0.0)
        fx = lvx * t - dpx
        fy = lvy * t - dpy
        field = jnp.sqrt(fx * fx + fy * fy)
        return rgb, jnp.minimum(df, field), area

    def cmd_stroke(i, rgb, df, area):
        half_width = arg(i, 0)
        fr, fg_, fb, fa = arg(i, 1), arg(i, 2), arg(i, 3), arg(i, 4)
        alpha = _saturate(half_width + 0.5 - df)
        w = fa * alpha
        fgc = jnp.stack([jnp.full_like(alpha, fr), jnp.full_like(alpha, fg_),
                         jnp.full_like(alpha, fb)])
        rgb = rgb + (fgc - rgb) * w[None]
        return rgb, jnp.full_like(df, DF_INIT), area

    def cmd_fill(i, rgb, df, area):
        sx, sy, ex, ey = arg(i, 0), arg(i, 1), arg(i, 2), arg(i, 3)
        rsx, rsy = sx - X, sy - Y
        rex, rey = ex - X, ey - Y
        w0 = _saturate(rsy)
        w1 = _saturate(rey)
        mask = w0 != w1
        dy = rey - rsy
        t0 = (w0 - rsy) / dy
        t1 = (w1 - rsy) / dy
        xs0 = rsx + (rex - rsx) * t0
        xs1 = rsx + (rex - rsx) * t1
        xmin = jnp.minimum(jnp.minimum(xs0, xs1), 1.0) - 1e-6
        xmax = jnp.maximum(xs0, xs1)
        bq = jnp.minimum(xmax, 1.0)
        cq = jnp.maximum(bq, 0.0)
        dq = jnp.maximum(xmin, 0.0)
        a_cov = (bq + 0.5 * (dq * dq - cq * cq) - xmin) / (xmax - xmin)
        # Guard for the reference's coverage-NaN fudge bug; see cpu_fine.py.
        a_cov = jnp.where(xmax > xmin, a_cov, 1.0 - _saturate(xs0))
        delta = a_cov * (w0 - w1)
        return rgb, df, jnp.where(mask, area + delta, area)

    def cmd_fill_edge(i, rgb, df, area):
        sgn, ye = arg(i, 0), arg(i, 1)
        return rgb, df, area + sgn * _saturate(Y - ye + 1.0)

    def cmd_draw_fill(i, rgb, df, area):
        backdrop = arg(i, 0)
        fr, fg_, fb, fa = arg(i, 1), arg(i, 2), arg(i, 3), arg(i, 4)
        alpha = jnp.minimum(jnp.abs(area + backdrop), 1.0)  # nonzero winding
        w = fa * alpha
        fgc = jnp.stack([jnp.full_like(alpha, fr), jnp.full_like(alpha, fg_),
                         jnp.full_like(alpha, fb)])
        rgb = rgb + (fgc - rgb) * w[None]
        return rgb, df, jnp.zeros_like(area)

    def cmd_solid(i, rgb, df, area):
        fr, fg_, fb, fa = arg(i, 0), arg(i, 1), arg(i, 2), arg(i, 3)
        fgc = jnp.stack([jnp.full_like(area, fr), jnp.full_like(area, fg_),
                         jnp.full_like(area, fb)])
        rgb = rgb + (fgc - rgb) * fa
        return rgb, df, area

    # Tag values 2..8 (CMD_CIRCLE..CMD_SOLID); branch index = tag - 2.
    branches = (cmd_circle, cmd_line, cmd_fill, cmd_stroke, cmd_fill_edge,
                cmd_draw_fill, cmd_solid)
    # Reference tag order: Circle=2 Line=3 Fill=4 Stroke=5 FillEdge=6
    # DrawFill=7 Solid=8.
    ordered = (cmd_circle, cmd_line, cmd_fill, cmd_stroke, cmd_fill_edge,
               cmd_draw_fill, cmd_solid)
    del branches

    def body(i, state):
        rgb, df, area = state
        tag = tags_ref[0, i]
        idx = jnp.clip(tag - 2, 0, 6)
        return jax.lax.switch(idx, ordered, i, rgb, df, area)

    rgb0 = jnp.ones((3, tile_h, tile_w), jnp.float32)
    df0 = jnp.full((tile_h, tile_w), DF_INIT, jnp.float32)
    area0 = jnp.zeros((tile_h, tile_w), jnp.float32)
    n = counts_ref[0, 0]
    rgb, _, _ = jax.lax.fori_loop(0, n, body, (rgb0, df0, area0))

    # Linear -> sRGB (exact reference formula, PietRender.metal:563) and
    # pack to RGBA8 in a u32 (R in the low byte, matching the wire order).
    rgb = jnp.clip(rgb, 0.0, 1.0)
    srgb = jnp.where(rgb < 0.0031308, 12.92 * rgb,
                     1.055 * jnp.power(rgb, 1.0 / 2.4) - 0.055)
    bytes_ = jnp.round(srgb * 255.0).astype(jnp.uint32)
    packed = (bytes_[0] | (bytes_[1] << 8) | (bytes_[2] << 16)
              | jnp.uint32(0xFF000000))
    out_ref[:] = packed


@functools.partial(jax.jit, static_argnames=("tile_h", "tile_w",
                                             "cmd_capacity", "interpret"))
def fine_rasterize(counts: jax.Array, tags: jax.Array, args: jax.Array,
                   *, tile_h: int, tile_w: int, cmd_capacity: int,
                   interpret: bool = False) -> jax.Array:
    """Rasterize all tiles.

    Args:
      counts: (tiles_y, tiles_x) int32 live-command counts.
      tags: (T, CAP) int32 command tags (T = tiles_y * tiles_x, row-major).
      args: (T, CAP * 8) float32 flattened command operands.

    Returns:
      (tiles_y * tile_h, tiles_x * tile_w) uint32 packed RGBA8 pixels.
    """
    tiles_y, tiles_x = counts.shape
    kernel = functools.partial(_fine_kernel, tile_h=tile_h, tile_w=tile_w,
                               cmd_capacity=cmd_capacity)
    return pl.pallas_call(
        kernel,
        grid=(tiles_y, tiles_x),
        in_specs=[
            pl.BlockSpec((1, 1), lambda ty, tx: (ty, tx),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, cmd_capacity),
                         lambda ty, tx: (ty * tiles_x + tx, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, cmd_capacity * ARG_WORDS),
                         lambda ty, tx: (ty * tiles_x + tx, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((tile_h, tile_w), lambda ty, tx: (ty, tx),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (tiles_y * tile_h, tiles_x * tile_w), jnp.uint32),
        interpret=interpret,
    )(counts, tags, args)
