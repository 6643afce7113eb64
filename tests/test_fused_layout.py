"""Inference-fused (qkv / gate_up) layout must match the unfused decoder."""

import jax
import jax.numpy as jnp
import numpy as np

from vis_zephyr_tpu.config import DecoderConfig
from vis_zephyr_tpu.models.mistral import (
    embed,
    fuse_decoder_layers,
    init_cache,
    init_mistral,
    mistral_forward,
)
from vis_zephyr_tpu.ops.quant import quantize_decoder_layers

CFG = DecoderConfig(
    vocab_size=128, hidden_size=64, intermediate_size=128, num_layers=2,
    num_heads=4, num_kv_heads=2, head_dim=16, sliding_window=None,
)


def test_fused_matches_unfused(rng):
    params = init_mistral(CFG, jax.random.PRNGKey(0))
    fused = dict(params)
    fused = fuse_decoder_layers(params)
    ids = jnp.asarray(rng.integers(0, CFG.vocab_size, (2, 7)))
    pos = jnp.broadcast_to(jnp.arange(7), (2, 7))
    a, _ = mistral_forward(params, embed(params, ids), CFG, pos)
    b, _ = mistral_forward(fused, embed(fused, ids), CFG, pos)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5)


def test_fused_quantized_decode(rng):
    params = quantize_decoder_layers(init_mistral(CFG, jax.random.PRNGKey(1)))
    fused = fuse_decoder_layers(params)
    ids = jnp.asarray(rng.integers(0, CFG.vocab_size, (1, 5)))
    cache_a = init_cache(CFG, 1, 16, dtype=jnp.float32)
    cache_b = init_cache(CFG, 1, 16, dtype=jnp.float32)
    pos = jnp.arange(5)[None]
    a, _ = mistral_forward(params, embed(params, ids), CFG, pos, cache=cache_a)
    b, _ = mistral_forward(fused, embed(fused, ids), CFG, pos, cache=cache_b)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5)
