"""Pure-XLA fine rasterizer: portable PTCL interpreter.

Second device implementation of the reference ``renderKernel``
(TestApp/PietRender.metal:457-566), built from the same shared command
math as the Pallas kernel (ops/cmd_math.py) but expressed as plain XLA:
``vmap`` over tiles of a ``fori_loop`` over command slots, with the 7-way
dispatch vectorized as compute-all-branches + select (the standard vmap
lowering of ``lax.switch``).

Roles:
* a portable fallback so the renderer also runs on CPU/GPU backends
  (bit-exact to the oracle on TPU; within the documented FMA tolerance
  through XLA:CPU -- see cmd_math.py),
* the fast CPU test vehicle for the shared command math.

On TPU the Pallas kernel (ops/fine.py) is strictly better: it skips dead
command slots per tile and streams the PTCL through SMEM; this version
pays the full ``max(counts)`` trip count for every tile, evaluating all
seven branches.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..raster.ptcl import ARG_WORDS
from .cmd_math import DF_INIT, make_commands, pack_rgba8


@functools.partial(jax.jit, static_argnames=("tile_h", "tile_w",
                                             "cmd_capacity"))
def fine_rasterize_xla(counts: jax.Array, tags: jax.Array, args: jax.Array,
                       row0=0, *, tile_h: int, tile_w: int,
                       cmd_capacity: int) -> jax.Array:
    """Rasterize all tiles; same contract as ops/fine.py::fine_rasterize.

    Args:
      counts: (tiles_y, tiles_x) int32 live-command counts.
      tags: (T, CAP) int32 command tags.
      args: (T, CAP * ARG_WORDS) float32 command operands (ARG_WORDS =
        12; words 8-11 carry the draw-command clip rect).

    ``row0``: first tile row of this shard's slab (traced OK) -- pixel
    coordinates are absolute, output shape is the local slab.

    Returns:
      (tiles_y * tile_h, tiles_x * tile_w) uint32 packed RGBA8 pixels.
    """
    tiles_y, tiles_x = counts.shape
    n_tiles = tiles_y * tiles_x
    bar = jax.lax.optimization_barrier
    args3 = args.reshape(n_tiles, cmd_capacity, ARG_WORDS)
    origins_x = (jnp.arange(n_tiles, dtype=jnp.int32) % tiles_x) * tile_w
    origins_y = (jnp.int32(row0)
                 + jnp.arange(n_tiles, dtype=jnp.int32) // tiles_x) * tile_h
    n_max = jnp.max(counts)

    def tile_fn(tag_row, arg_row, count, ox, oy):
        X = ox.astype(jnp.float32) + jax.lax.broadcasted_iota(
            jnp.int32, (tile_h, tile_w), 1).astype(jnp.float32)
        Y = oy.astype(jnp.float32) + jax.lax.broadcasted_iota(
            jnp.int32, (tile_h, tile_w), 0).astype(jnp.float32)
        # lax.switch can't take a function operand; pass the (ARG_WORDS,)
        # vector and let each lifted branch index it.
        def lift(cmd):
            def branch(words, r, g, b, df, area):
                return cmd(lambda k: words[k], r, g, b, df, area)
            return branch

        cmds = tuple(lift(c) for c in make_commands(X, Y, bar))

        def body(j, st):
            r, g, b, df, area = st
            idx = jnp.clip(tag_row[j] - 2, 0, 6)
            nr, ng, nb, ndf, narea = jax.lax.switch(
                idx, cmds, arg_row[j], r, g, b, df, area)
            live = j < count
            pick = lambda new, old: jnp.where(live, new, old)
            return (pick(nr, r), pick(ng, g), pick(nb, b),
                    pick(ndf, df), pick(narea, area))

        shp = (tile_h, tile_w)
        st0 = (jnp.ones(shp, jnp.float32), jnp.ones(shp, jnp.float32),
               jnp.ones(shp, jnp.float32),
               jnp.full(shp, DF_INIT, jnp.float32),
               jnp.zeros(shp, jnp.float32))
        r, g, b, _, _ = jax.lax.fori_loop(0, n_max, body, st0)
        return pack_rgba8(r, g, b, bar)

    tiles = jax.vmap(tile_fn)(tags, args3, counts.reshape(-1),
                              origins_x, origins_y)
    return (tiles.reshape(tiles_y, tiles_x, tile_h, tile_w)
            .transpose(0, 2, 1, 3)
            .reshape(tiles_y * tile_h, tiles_x * tile_w))
