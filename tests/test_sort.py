"""Bitonic sort network vs lax.sort (the stability contract).

The coarse pass's painter's order rides on stable_sort_multi being
bit-identical to a stable lax.sort; the pure-jnp network shares the
compare-exchange math with the Pallas kernel (ops/sort.py), so these
CPU tests pin the network itself.  The Pallas kernel is exercised
end-to-end on hardware by tests/test_tpu_exact.py via the renderer.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from piet_tpu.ops.sort import stable_sort_multi, stable_sort_pairs


def _ref(keys, val):
    out = jax.lax.sort(tuple(keys) + (val,), dimension=0,
                       num_keys=len(keys), is_stable=True)
    return out[:-1], out[-1]


@pytest.mark.parametrize("n", [256, 300, 1024])
@pytest.mark.parametrize("seed", [0, 1])
def test_single_key_matches_stable_sort(n, seed):
    rng = np.random.default_rng(seed)
    # Heavy duplication to exercise the stability tie-break.
    key = jnp.asarray(rng.integers(0, 17, n).astype(np.float32))
    val = jnp.arange(n, dtype=jnp.int32)
    (ks,), vs = stable_sort_multi((key,), val, impl="jnp")
    (rk,), rv = _ref((key,), val)
    np.testing.assert_array_equal(np.asarray(ks), np.asarray(rk))
    np.testing.assert_array_equal(np.asarray(vs), np.asarray(rv))


def test_two_key_matches_stable_sort():
    rng = np.random.default_rng(2)
    n = 512
    k1 = jnp.asarray(rng.integers(0, 7, n).astype(np.float32))
    k2 = jnp.asarray(rng.integers(0, 5, n).astype(np.float32))
    val = jnp.arange(n, dtype=jnp.int32)
    (s1, s2), vs = stable_sort_multi((k1, k2), val, impl="jnp")
    (r1, r2), rv = _ref((k1, k2), val)
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(r1))
    np.testing.assert_array_equal(np.asarray(s2), np.asarray(r2))
    np.testing.assert_array_equal(np.asarray(vs), np.asarray(rv))


def test_inf_padding_keeps_dead_records_ordered():
    # Dead records carry +inf keys; stable order among them (by index)
    # must survive the pow2 padding.
    key = jnp.asarray([np.inf, 3.0, np.inf, 1.0, np.inf], jnp.float32)
    val = jnp.arange(5, dtype=jnp.int32)
    (ks,), vs = stable_sort_multi((key,), val, impl="jnp")
    np.testing.assert_array_equal(np.asarray(vs), [3, 1, 0, 2, 4])
    assert np.asarray(ks)[2:].tolist() == [np.inf] * 3


def test_pairs_wrapper_int_keys():
    rng = np.random.default_rng(3)
    key = jnp.asarray(rng.integers(0, 1000, 300), jnp.int32)
    val = jnp.arange(300, dtype=jnp.int32)
    ks, vs = stable_sort_pairs(key, val, impl="jnp")
    rk, rv = jax.lax.sort((key, val), dimension=0, num_keys=1,
                          is_stable=True)
    np.testing.assert_array_equal(np.asarray(ks), np.asarray(rk))
    np.testing.assert_array_equal(np.asarray(vs), np.asarray(rv))
