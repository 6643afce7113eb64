"""Dense cache in-place row write (`ops/kv_cache.dense_cache_update`) ==
the XLA scatter it replaces, including multi-token (speculative verify)
appends and dtype casts."""

import jax
import jax.numpy as jnp
import numpy as np

from vis_zephyr_tpu.ops.kv_cache import dense_cache_update


def test_matches_xla_scatter(rng):
    L, B, S, Hkv, D, T = 3, 4, 32, 2, 128, 3
    ck = jnp.asarray(rng.standard_normal((L, B, S, Hkv, D)), jnp.float32)
    cv = jnp.asarray(rng.standard_normal((L, B, S, Hkv, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, T, Hkv, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, T, Hkv, D)), jnp.float32)
    lengths = jnp.asarray(rng.integers(0, S - T, (B,)), jnp.int32)
    i = 1
    slot = lengths[:, None] + jnp.arange(T)[None, :]
    bidx = jnp.arange(B)[:, None]
    ref_k = np.asarray(ck.at[i, bidx, slot].set(k))
    ref_v = np.asarray(cv.at[i, bidx, slot].set(v))
    got_k, got_v = dense_cache_update(ck, cv, k, v, lengths, i)
    np.testing.assert_array_equal(np.asarray(got_k), ref_k)
    np.testing.assert_array_equal(np.asarray(got_v), ref_v)


def test_casts_to_cache_dtype(rng):
    L, B, S, Hkv, D = 2, 2, 16, 2, 128
    ck = jnp.zeros((L, B, S, Hkv, D), jnp.bfloat16)
    cv = jnp.zeros((L, B, S, Hkv, D), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, 1, Hkv, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, 1, Hkv, D)), jnp.float32)
    lengths = jnp.asarray([0, 5], jnp.int32)
    got_k, _ = dense_cache_update(ck, cv, k, v, lengths, 0)
    assert got_k.dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(got_k[0, 0, 0]), np.asarray(k[0, 0].astype(jnp.bfloat16)))
    np.testing.assert_array_equal(
        np.asarray(got_k[0, 1, 5]), np.asarray(k[1, 0].astype(jnp.bfloat16)))
    # Untouched rows stay zero.
    assert float(jnp.abs(got_k[0, 0, 1:]).max()) == 0.0
    assert float(jnp.abs(got_k[1]).max()) == 0.0
