"""Bitonic (keys..., payload) sort -- the coarse pass's painter's-order engine.

``jax.lax.sort`` on TPU costs ~145 ns/element inside the coarse pipeline
(measured: 7-8 ms of the 4K tiger's 14 ms frame at 58k records), which made
it the single largest stage of the round-1 pipeline.  A bitonic network is
the TPU-native answer: every compare-exchange pass is a dense vector
operation (two rolls + selects), there is no data-dependent control flow,
and the whole working set lives in VMEM for all ~log^2(N)/2 passes (~136
at N=2^16), so HBM is touched exactly twice.

Keys are float32 in the production pipeline: the coarse pass packs
(tile, item, class) into integers < 2^24, which f32 represents exactly --
and crucially, f32 selects are fast on TPU where s32 selects in fused
contexts hit an XLA:TPU slow path (measured 4.2 ms vs 0.03 ms for the same
select at 37k elements).  The kernel itself is dtype-generic.

Two implementations share the same network:

* ``_sort_jnp`` -- pure jnp over (N,) arrays; runs on every backend and is
  the correctness reference (compiles slowly at large N -- the unrolled
  network strains XLA:CPU -- so CPU production paths use lax.sort, which
  is only slow on TPU).
* ``_sort_pallas`` -- one Pallas kernel holding the (N/128, 128) key and
  payload arrays in VMEM across all passes.

Stability: bitonic networks are not stable, so the payload (a unique
record index) is folded into the comparison -- (keys..., idx)
lexicographic order is total, which makes the result *identical* to a
stable sort on the keys alone (tests/test_sort.py asserts equality with
``lax.sort(..., is_stable=True)``).

The XOR-partner exchange: at pass stride ``j``, element ``i`` exchanges
with ``i ^ j``.  For the element with bit ``j`` clear the partner is
``i + j`` (a roll by ``-j``); for the element with bit set it is ``i - j``
(a roll by ``+j``); a parity select between the two rolled arrays yields
every element's partner with no gather.  The cyclic wrap of the roll never
matters: selected lanes never cross their block boundary.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu



def _pad_value(dtype):
    if jnp.issubdtype(dtype, jnp.floating):
        return jnp.array(jnp.inf, dtype)
    return jnp.array(jnp.iinfo(dtype).max, dtype)


def _substages(n: int):
    """Yield (k, j) for the bitonic network over n = 2^m elements."""
    k = 2
    while k <= n:
        j = k // 2
        while j >= 1:
            yield k, j
            j //= 2
        k *= 2


def _lex_lt(cols, partner_cols):
    """Strict lexicographic (keys..., idx) less-than; idx is cols[-1] and
    unique, so the order is total."""
    lt = None
    eq = None
    for a, b in zip(cols, partner_cols):
        a_lt = a < b
        a_eq = a == b
        if lt is None:
            lt, eq = a_lt, a_eq
        else:
            lt = lt | (eq & a_lt)
            eq = eq & a_eq
    return lt


def _ce(cols, partner_cols, low, asc):
    """One compare-exchange: every element keeps min or max of (self,
    partner) under lexicographic order, by network role."""
    a_lt = _lex_lt(cols, partner_cols)
    keep_self = (low == asc) == a_lt
    return tuple(jnp.where(keep_self, a, b)
                 for a, b in zip(cols, partner_cols))


# ---------------------------------------------------------------------------
# Pure-jnp network (any backend; correctness reference).

def _sort_jnp(cols):
    n = cols[0].shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    for k, j in _substages(n):
        low = (idx & j) == 0
        partners = tuple(
            jnp.where(low, jnp.roll(c, -j), jnp.roll(c, j)) for c in cols)
        asc = (idx & k) == 0
        cols = _ce(cols, partners, low, asc)
    return cols


# ---------------------------------------------------------------------------
# Pallas kernel: whole arrays resident in VMEM across all passes.

def _sort_kernel(*refs, n: int, n_arrays: int):
    in_refs = refs[:n_arrays]
    out_refs = refs[n_arrays:]
    rows = n // 128
    row_id = jax.lax.broadcasted_iota(jnp.int32, (rows, 128), 0)
    lane_id = jax.lax.broadcasted_iota(jnp.int32, (rows, 128), 1)
    cols = tuple(r[:] for r in in_refs)
    for k, j in _substages(n):
        if j >= 128:
            ax, s = 0, j // 128
            low = (row_id & s) == 0
        else:
            ax, s = 1, j
            low = (lane_id & j) == 0
        size = cols[0].shape[ax]
        # pltpu.roll requires non-negative shifts: -s mod size.
        partners = tuple(
            jnp.where(low, pltpu.roll(c, size - s, ax), pltpu.roll(c, s, ax))
            for c in cols)
        if k >= 128:
            asc = (row_id & (k // 128)) == 0
        else:
            asc = (lane_id & k) == 0
        cols = _ce(cols, partners, low, asc)
    for r, c in zip(out_refs, cols):
        r[:] = c


def _sort_pallas(cols, interpret: bool = False):
    n = cols[0].shape[0]
    rows = n // 128
    kernel = functools.partial(_sort_kernel, n=n, n_arrays=len(cols))
    out = pl.pallas_call(
        kernel,
        out_shape=tuple(jax.ShapeDtypeStruct((rows, 128), c.dtype)
                        for c in cols),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(cols),
        out_specs=tuple(pl.BlockSpec(memory_space=pltpu.VMEM)
                        for _ in cols),
        interpret=interpret,
    )(*(c.reshape(rows, 128) for c in cols))
    return tuple(o.reshape(n) for o in out)


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


#: Largest padded element count the Pallas network is allowed to take.
#: Mosaic decomposes each substage's rolls/selects into per-vreg ops, so
#: the kernel's op count scales ~ n * log^2(n): at 2^18 (the beziers_10k
#: bench scale) the compile is minutes and measured fine; at 2^20 (the
#: old RenderConfig DEFAULT max_hits) the compile ran >30 min and was the
#: round-3 "exactness test 4 hang" (tools/onchip_r3.log; reproduced
#: chiplessly).  Above the cap, fall back to lax.sort: ~145 ns/element on
#: TPU -- slow but it compiles, and production paths never sort past the
#: cap (Renderer.for_scene fits capacities to exact scene counts).
PALLAS_SORT_MAX = 1 << 18


def stable_sort_multi(keys, val: jax.Array, *, impl: str = "auto",
                      interpret: bool = False):
    """Stable lexicographic sort of (keys..., val) by ``keys``.

    ``val`` must be unique (it is the record index in the coarse pass);
    folding it into the comparison makes the bitonic result bit-identical
    to ``lax.sort(keys + (val,), num_keys=len(keys), is_stable=True)``.

    impl: "pallas" (TPU), "jnp" (any backend, small N), "xla" (lax.sort),
    or "auto" (pallas on TPU, lax.sort elsewhere).
    Returns (sorted_keys_tuple, sorted_val).
    """
    keys = tuple(keys)
    n = keys[0].shape[0]
    if impl == "auto":
        # jax_default_device (when pinned, e.g. by tests/conftest.py or the
        # multichip dryrun) wins over default_backend(): the axon TPU
        # plugin registers itself even when the session runs on CPU.
        dd = jax.config.jax_default_device
        platform = dd.platform if dd is not None else jax.default_backend()
        impl = "pallas" if platform == "tpu" else "xla"
    if impl != "xla" and _next_pow2(n) > PALLAS_SORT_MAX:
        impl = "xla"  # compile-size guard; see PALLAS_SORT_MAX
    if impl == "xla":
        out = jax.lax.sort(keys + (val,), dimension=0, num_keys=len(keys),
                           is_stable=True)
        return out[:-1], out[-1]
    np2 = max(_next_pow2(n), 256)
    if np2 != n:
        keys = tuple(
            jnp.concatenate([k, jnp.full((np2 - n,), _pad_value(k.dtype))])
            for k in keys)
        # Payload stays unique past n, preserving the total order.
        val = jnp.concatenate([val, jnp.arange(n, np2, dtype=val.dtype)])
    cols = keys + (val,)
    if impl == "pallas":
        out = _sort_pallas(cols, interpret=interpret)
    else:
        out = _sort_jnp(cols)
    return tuple(o[:n] for o in out[:-1]), out[-1][:n]


def stable_sort_pairs(key: jax.Array, val: jax.Array, *,
                      impl: str = "auto"):
    """Single-key convenience wrapper around :func:`stable_sort_multi`."""
    (ks,), vs = stable_sort_multi((key,), val, impl=impl)
    return ks, vs
