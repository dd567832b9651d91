"""Compile-probe the Mosaic primitives the batched fine-kernel needs.

The round-3 batched-group design (ROADMAP: operands consumed as vectors,
8-entry/4-entry sublane batches) hinges on which access patterns Mosaic
can lower.  Each probe compiles ONE pallas kernel (AOT, chipless -- no
chip occupancy needed) and reports OK / the Mosaic error, so the kernel
layout is chosen on facts, not guesses.

Usage: python tools/mosaic_probe.py [probe ...]
"""

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PROBES = {}


def probe(name):
    def deco(fn):
        PROBES[name] = fn
        return fn
    return deco


def _compile(kernel, out_shape, scratch_shapes=(), n_in=1):
    f = pl.pallas_call(
        kernel,
        grid=(4,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * n_in,
        out_specs=pl.BlockSpec(out_shape.shape, lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=out_shape,
        scratch_shapes=list(scratch_shapes),
    )
    args = [jax.ShapeDtypeStruct((16, 128), jnp.float32)] * n_in
    jax.jit(f).lower(*args).compile()


@probe("lane_slice_computed")
def p_lane_slice(x_ref, out_ref):
    """Static single-lane slice of a COMPUTED vector -> (8,1)."""
    v = x_ref[0:8, :] * 2.0
    col = v[:, 3:4]                       # (8,1) static lane slice
    out_ref[:] = jnp.zeros((8, 128), jnp.float32) + col


@probe("lane_slice_ref")
def p_lane_slice_ref(x_ref, out_ref):
    """Static single-lane slice LOAD from a VMEM ref -> (8,1)."""
    col = x_ref[0:8, 3:4]
    out_ref[:] = jnp.zeros((8, 128), jnp.float32) + col


@probe("lane_slice_ref_dyn")
def p_lane_slice_ref_dyn(x_ref, out_ref):
    """DYNAMIC single-lane slice load from a VMEM ref -> (8,1)."""
    i = pl.program_id(0)
    col = x_ref[0:8, pl.ds(i, 1)]
    out_ref[:] = jnp.zeros((8, 128), jnp.float32) + col


@probe("roll_dynamic")
def p_roll_dynamic(x_ref, out_ref):
    """pltpu.roll with a dynamic lane shift."""
    i = pl.program_id(0)
    v = x_ref[0:8, :]
    out_ref[:] = pltpu.roll(v, i * 16, 1)


@probe("sublane_dyn_load")
def p_sublane_dyn(x_ref, out_ref):
    """Dynamic sublane slice load (4 rows) + broadcast."""
    i = pl.program_id(0)
    v = x_ref[pl.ds(i, 4), :]             # (4,128) dynamic sublane
    out_ref[:] = jnp.concatenate([v, v], axis=0)


@probe("stack_scalars")
def p_stack_scalars(x_ref, out_ref, s_ref):
    """Build a (8,1) vector from 8 SMEM scalars."""
    col = jnp.stack([s_ref[k] for k in range(8)]).reshape(8, 1)
    out_ref[:] = jnp.zeros((8, 128), jnp.float32) + col


@probe("transpose_block")
def p_transpose(x_ref, out_ref, t_ref):
    """(16,128) -> (128,16) in-kernel transpose into VMEM scratch."""
    t_ref[:] = jnp.transpose(x_ref[:], (1, 0))
    out_ref[:] = jnp.zeros((8, 128), jnp.float32) + t_ref[0, 0]


@probe("bcast_and_reduce")
def p_bcast_reduce(x_ref, out_ref):
    """(8,1)x(1,128) broadcast math + sublane min-reduce keepdims."""
    a = x_ref[0:8, 0:1]                   # (8,1)
    xs = x_ref[0:1, :]                    # (1,128)
    f = a * xs + a
    red = jnp.min(f, axis=0, keepdims=True)   # (1,128)
    out_ref[:] = jnp.zeros((8, 128), jnp.float32) + red


@probe("rmw_dyn_row")
def p_rmw_dyn_row(x_ref, out_ref, acc_ref):
    """(1,128) read-modify-write at a dynamic sublane offset."""
    i = pl.program_id(0)
    row = acc_ref[pl.ds(i, 1), :]
    acc_ref[pl.ds(i, 1), :] = jnp.minimum(row, x_ref[0:1, :])
    out_ref[:] = acc_ref[0:8, :]


@probe("major_dyn_scratch")
def p_major_dyn(x_ref, out_ref, g_ref):
    """(8,1) load at [dynamic, :, static-lane] from 3D VMEM scratch."""
    i = pl.program_id(0)
    g_ref[0] = x_ref[0:8, :]
    col = g_ref[i, :, 2:3]                # (8,1)
    out_ref[:] = jnp.zeros((8, 128), jnp.float32) + col


@probe("pair_rows_bcast")
def p_pair_rows(x_ref, out_ref):
    """(8,1) operands where sublane pairs share values (batch-4 x 2 rows):
    built by interleave-reshape of a (4,1)."""
    a = x_ref[0:4, 0:1]                   # (4,1)
    a2 = jnp.concatenate([a, a], axis=1).reshape(8, 1)
    out_ref[:] = jnp.zeros((8, 128), jnp.float32) + a2


SCRATCH = {
    "dyn2_read": [pltpu.VMEM((4, 16, 128), jnp.float32)],
    "splat11_concat": [pltpu.VMEM((128, 16), jnp.float32)],
    "splat11_repeat": [pltpu.VMEM((128, 16), jnp.float32)],
    "splat11_mul": [pltpu.VMEM((128, 16), jnp.float32)],
    "splat11_chain": [pltpu.VMEM((128, 16), jnp.float32)],
    "dynsub_statlane": [pltpu.VMEM((128, 16), jnp.float32)],
    "splat11": [pltpu.VMEM((128, 16), jnp.float32)],
    "stack_scalars": [pltpu.SMEM((8,), jnp.float32)],
    "transpose_block": [pltpu.VMEM((128, 16), jnp.float32)],
    "rmw_dyn_row": [pltpu.VMEM((32, 128), jnp.float32)],
    "major_dyn_scratch": [pltpu.VMEM((8, 8, 128), jnp.float32)],
}


def _compile_dma16():
    f = pl.pallas_call(
        _dma16_kernel,
        grid=(4,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((8, 128), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        scratch_shapes=[pltpu.VMEM((4, 512, 16), jnp.float32),
                        pltpu.SemaphoreType.DMA],
    )
    jax.jit(f).lower(jax.ShapeDtypeStruct((1024, 16), jnp.float32)).compile()


def main():
    names = sys.argv[1:] or list(PROBES)
    out = jax.ShapeDtypeStruct((8, 128), jnp.float32)
    for nm in names:
        try:
            if nm == "dma_16lane":
                _compile_dma16()
            else:
                _compile(PROBES[nm], out, SCRATCH.get(nm, ()))
            print(f"{nm}: OK", flush=True)
        except Exception as e:
            msg = str(e).split("\n")[0][:160]
            print(f"{nm}: FAIL {type(e).__name__}: {msg}", flush=True)
            if os.environ.get("PROBE_TB"):
                traceback.print_exc()



@probe("dynsub_statlane")
def p_dynsub_statlane(x_ref, out_ref, t_ref):
    """(4,1) load at [dynamic-sublane, static-lane] -- the batched
    operand read from the transposed block."""
    i = pl.program_id(0)
    t_ref[:] = jnp.transpose(x_ref[:], (1, 0))
    col = t_ref[pl.ds(i * 4, 4), 2:3]      # (4,1)
    out_ref[:] = jnp.zeros((8, 128), jnp.float32) + jnp.concatenate(
        [col, col], axis=0)


@probe("splat11")
def p_splat11(x_ref, out_ref, t_ref):
    """(1,1) operand load broadcast into (8,128) math (design X)."""
    i = pl.program_id(0)
    t_ref[:] = jnp.transpose(x_ref[:], (1, 0))
    a = t_ref[pl.ds(i, 1), 2:3]            # (1,1)
    b = t_ref[pl.ds(i, 1), 3:4]
    out_ref[:] = x_ref[0:8, :] * a + b


@probe("grouped_sum_reshape")
def p_grouped_sum(x_ref, out_ref):
    """(8,128)->(2,4,128) sublane-split reshape + in-group sum."""
    v = x_ref[0:8, :]
    s = jnp.sum(v.reshape(2, 4, 128), axis=1)   # (2,128)
    out_ref[:] = jnp.concatenate([s, s, s, s], axis=0)


@probe("roll_tree_sum")
def p_roll_tree(x_ref, out_ref):
    """Explicit deterministic sublane tree-sum via static rolls."""
    v = x_ref[0:8, :]
    s1 = v + pltpu.roll(v, 4, 0)
    s2 = s1 + pltpu.roll(s1, 2, 0)
    s3 = s2 + pltpu.roll(s2, 1, 0)
    out_ref[:] = s3


@probe("repeat_sub")
def p_repeat_sub(x_ref, out_ref):
    """(4,1) -> (8,1) member-pair layout via jnp.repeat on sublanes."""
    a = x_ref[0:4, 0:1]
    a2 = jnp.repeat(a, 2, axis=0)
    out_ref[:] = jnp.zeros((8, 128), jnp.float32) + a2


@probe("concat0_41")
def p_concat0(x_ref, out_ref):
    """(4,1)+(4,1) sublane concat -> (8,1) [m0..m3,m0..m3] layout."""
    a = x_ref[0:4, 0:1]
    a2 = jnp.concatenate([a, a], axis=0)
    out_ref[:] = jnp.zeros((8, 128), jnp.float32) + a2


@probe("splat11_chain")
def p_splat11_chain(x_ref, out_ref, t_ref):
    """(1,1) -> (8,1) sublane broadcast, then lanes via implicit bcast."""
    i = pl.program_id(0)
    t_ref[:] = jnp.transpose(x_ref[:], (1, 0))
    a = jnp.broadcast_to(t_ref[pl.ds(i, 1), 2:3], (8, 1))
    b = jnp.broadcast_to(t_ref[pl.ds(i, 1), 3:4], (8, 1))
    out_ref[:] = x_ref[0:8, :] * a + b



@probe("splat11_mul")
def p_splat11_mul(x_ref, out_ref, t_ref):
    """(1,1) -> (8,1) via *ones (x*1.0 is bitwise-exact), then lanes."""
    i = pl.program_id(0)
    t_ref[:] = jnp.transpose(x_ref[:], (1, 0))
    one81 = jnp.ones((8, 1), jnp.float32)
    a = t_ref[pl.ds(i, 1), 2:3] * one81
    b = t_ref[pl.ds(i, 1), 3:4] * one81
    out_ref[:] = x_ref[0:8, :] * a + b



@probe("splat11_concat")
def p_splat11_concat(x_ref, out_ref, t_ref):
    """(1,1) -> (8,1) via 8-way sublane concat (data op, unfoldable?)."""
    i = pl.program_id(0)
    t_ref[:] = jnp.transpose(x_ref[:], (1, 0))
    a = t_ref[pl.ds(i, 1), 2:3]
    a8 = jnp.concatenate([a] * 8, axis=0)
    out_ref[:] = x_ref[0:8, :] * a8


@probe("splat11_repeat")
def p_splat11_repeat(x_ref, out_ref, t_ref):
    """(1,1) -> (8,1) via pltpu.repeat."""
    i = pl.program_id(0)
    t_ref[:] = jnp.transpose(x_ref[:], (1, 0))
    a = t_ref[pl.ds(i, 1), 2:3]
    a8 = pltpu.repeat(a, 8, 0)
    out_ref[:] = x_ref[0:8, :] * a8



@probe("dyn2_read")
def p_dyn2_read(x_ref, out_ref, g_ref):
    """[dyn-major, dyn-sublane, static-lane] (1,1) read from 3D scratch."""
    i = pl.program_id(0)
    g_ref[0] = x_ref[:]
    a = g_ref[i, pl.ds(i * 2, 1), 2:3]
    a8 = pltpu.repeat(a, 8, 0)
    out_ref[:] = jnp.zeros((8, 128), jnp.float32) + a8


def _dma16_kernel(hbm_ref, out_ref, t_ref, sem):
    i = pl.program_id(0)
    cp = pltpu.make_async_copy(
        hbm_ref.at[pl.ds(i * 128, 512), :], t_ref.at[1], sem)
    cp.start()
    cp.wait()
    a8 = pltpu.repeat(t_ref[1, pl.ds(i, 1), 3:4], 8, 0)
    out_ref[:] = jnp.zeros((8, 128), jnp.float32) + a8


@probe("dma_16lane")
def p_dma_16lane(*a, **k):
    raise RuntimeError("handled specially")


if __name__ == "__main__":
    main()
