"""Reduced-precision experiment (VERDICT missing #4).

The reference keeps color/coverage in half (PietRender.metal:470-472).
Question: does a half-precision state pipeline speed up the TPU fine
kernel?  Hypothesis: NO -- the VPU datapath is 32-bit-lane; bf16
elementwise ops do not pack 2/lane (only the MXU gains from bf16), so
half state saves VMEM but not cycles, while costing exactness vs the
f32 oracle.

Method: a Pallas kernel running the fine interpreter's per-entry vector
op mix (mul/add/min/max/select chain over the tile state) x N entries,
in f32 vs bf16, at (32,128) and (16,128) tile shapes.  Report ns/entry.
"""
import functools, time
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N_ITER = 4096

def _mix_kernel(out_ref, st0, st1, st2, *, dtype, shape):
    one = jnp.ones(shape, dtype)
    st0[:] = one
    st1[:] = one * 2
    st2[:] = jnp.zeros(shape, dtype)

    def body(i, _):
        # ~24-op chain like one fine entry: linear eval, clamps, select,
        # min-accumulate, add-accumulate.
        a = st0[:] * 1.25 + st1[:]
        b = jnp.maximum(jnp.minimum(a, one * 8), -a)
        # Mosaic refuses bf16 vector compares ("Target does not support
        # this comparison"); compare in f32 in BOTH dtypes so the op mix
        # stays comparable (no-op upcast for the f32 run).
        mask = b.astype(jnp.float32) > st2[:].astype(jnp.float32)
        c = jnp.where(mask, b * 0.5 + st1[:], st2[:])
        d = jnp.minimum(st0[:], c * c + b)
        e = st2[:] + (d - b) * 0.125
        st0[:] = jnp.minimum(st0[:], d)
        st1[:] = jnp.maximum(st1[:], e)
        st2[:] = e
        return 0

    jax.lax.fori_loop(0, N_ITER, body, 0)
    out_ref[:] = st2[:].astype(jnp.float32)

def run(dtype, shape):
    kern = functools.partial(_mix_kernel, dtype=dtype, shape=shape)
    f = pl.pallas_call(
        kern,
        grid=(1,),
        out_specs=pl.BlockSpec(shape, lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
        scratch_shapes=[pltpu.VMEM(shape, dtype)] * 3,
    )
    jf = jax.jit(f)
    np.asarray(jf()).ravel()[0]
    reps = 20
    samples = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(reps):
            o = jf()
        np.asarray(o).ravel()[0]
        samples.append((time.perf_counter() - t0) / reps / N_ITER * 1e9)
    return float(np.median(samples))

for shape in ((32, 128), (16, 128)):
    for dt in (jnp.float32, jnp.bfloat16):
        ns = run(dt, shape)
        print(f"shape={shape} dtype={np.dtype(dt).name}: {ns:.1f} ns/entry",
              flush=True)
print("DONE", flush=True)
