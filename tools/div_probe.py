"""On-chip probe: does Mosaic f32 division bitwise-match XLA:TPU's?

The planned fused coarse kernel (ROADMAP item 1) moves the per-hit exact
tests -- including the t_edge = (sx - x0) / b division and the sqrt-free
sign culls -- from XLA:TPU into Mosaic.  Today's hardware bit-exactness
story rests on the XLA:TPU lowering of those expressions; this probe
checks, operand-distribution-realistically, whether Mosaic's div (and
mul/add ordering) produces the SAME bits, and how both compare to numpy's
IEEE-correct results.

Prints three lines: mosaic_vs_xla (the one that gates the fused kernel),
xla_vs_numpy, mosaic_vs_numpy.
"""

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(a_ref, b_ref, out_ref):
    out_ref[...] = a_ref[...] / b_ref[...]


def mosaic_div(a, b):
    return pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct(a.shape, jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(a, b)


def main():
    rng = np.random.default_rng(0)
    n = 1 << 20
    # Operand mix: generic f32s, near-integer ratios (the divmod regime),
    # tiny/huge magnitude pairs, and exact-multiple pairs (the measured
    # misrounding regime for rcp-based division).
    a = np.concatenate([
        rng.standard_normal(n // 4).astype(np.float32) * 1e3,
        rng.integers(1, 4096, n // 4).astype(np.float32),
        rng.standard_normal(n // 4).astype(np.float32) * 1e-3,
        (rng.integers(1, 512, n // 4) * rng.integers(1, 512, n // 4))
        .astype(np.float32),
    ]).reshape(-1, 128)
    b = np.concatenate([
        rng.standard_normal(n // 4).astype(np.float32) * 3.7,
        rng.integers(1, 64, n // 4).astype(np.float32),
        rng.standard_normal(n // 4).astype(np.float32) * 1e2,
        rng.integers(1, 512, n // 4).astype(np.float32),
    ]).reshape(-1, 128)
    b[b == 0] = 1.0

    aj, bj = jnp.asarray(a), jnp.asarray(b)
    xla = np.asarray(jax.jit(lambda x, y: x / y)(aj, bj))
    mos = np.asarray(jax.jit(mosaic_div)(aj, bj))
    ieee = a / b  # numpy: correctly rounded

    def report(name, x, y):
        xb, yb = x.view(np.uint32), y.view(np.uint32)
        neq = (xb != yb).sum()
        print(f"{name}: {'IDENTICAL' if neq == 0 else 'DIFFER'} "
              f"({neq}/{x.size} words)")

    report("mosaic_vs_xla", mos, xla)
    report("xla_vs_numpy", xla, ieee)
    report("mosaic_vs_numpy", mos, ieee)


if __name__ == "__main__":
    main()
