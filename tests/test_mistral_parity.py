"""Parity of the JAX Mistral decoder vs HF MistralForCausalLM, and
internal consistency of the KV-cache decode path."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp  # noqa: E402

from vis_zephyr_tpu.config import DecoderConfig  # noqa: E402
from vis_zephyr_tpu.models.hf_convert import convert_mistral  # noqa: E402
from vis_zephyr_tpu.models.mistral import (  # noqa: E402
    embed,
    init_cache,
    init_mistral,
    mistral_forward,
)

TINY = DecoderConfig(
    vocab_size=128,
    hidden_size=64,
    intermediate_size=128,
    num_layers=3,
    num_heads=4,
    num_kv_heads=2,
    head_dim=16,
    sliding_window=None,
)


def make_torch_mistral(cfg: DecoderConfig, sliding_window=None):
    hf_cfg = transformers.MistralConfig(
        vocab_size=cfg.vocab_size,
        hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size,
        num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads,
        num_key_value_heads=cfg.num_kv_heads,
        head_dim=cfg.head_dim,
        rms_norm_eps=cfg.rms_norm_eps,
        rope_theta=cfg.rope_theta,
        sliding_window=sliding_window,
        max_position_embeddings=512,
        tie_word_embeddings=False,
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    return transformers.MistralForCausalLM(hf_cfg).eval()


class TestMistralParity:
    def test_logits_match_hf(self, rng):
        cfg = TINY
        model = make_torch_mistral(cfg)
        params = convert_mistral(model.state_dict(), cfg)

        B, T = 2, 10
        ids = rng.integers(0, cfg.vocab_size, (B, T))
        with torch.no_grad():
            expect = model(torch.from_numpy(ids)).logits.numpy()

        positions = jnp.broadcast_to(jnp.arange(T), (B, T))
        logits, _ = mistral_forward(
            params, embed(params, jnp.asarray(ids)), cfg, positions
        )
        np.testing.assert_allclose(np.asarray(logits), expect, rtol=2e-4, atol=2e-4)

    def test_sliding_window_matches_hf(self, rng):
        cfg = DecoderConfig(**{**TINY.__dict__, "sliding_window": 4})
        model = make_torch_mistral(cfg, sliding_window=4)
        params = convert_mistral(model.state_dict(), cfg)

        B, T = 1, 12
        ids = rng.integers(0, cfg.vocab_size, (B, T))
        with torch.no_grad():
            expect = model(torch.from_numpy(ids)).logits.numpy()
        positions = jnp.broadcast_to(jnp.arange(T), (B, T))
        logits, _ = mistral_forward(params, embed(params, jnp.asarray(ids)), cfg, positions)
        np.testing.assert_allclose(np.asarray(logits), expect, rtol=2e-4, atol=2e-4)

    def test_padding_invariance(self, rng):
        """Right padding must not change logits of real tokens."""
        cfg = TINY
        params = init_mistral(cfg, __import__("jax").random.PRNGKey(0))
        ids = rng.integers(0, cfg.vocab_size, (1, 6))
        pos = jnp.arange(6)[None]
        logits_a, _ = mistral_forward(params, embed(params, jnp.asarray(ids)), cfg, pos)

        padded = np.concatenate([ids, rng.integers(0, cfg.vocab_size, (1, 3))], axis=1)
        valid = jnp.asarray([[True] * 6 + [False] * 3])
        pos_p = jnp.arange(9)[None]
        logits_b, _ = mistral_forward(
            params, embed(params, jnp.asarray(padded)), cfg, pos_p, attn_valid=valid
        )
        np.testing.assert_allclose(
            np.asarray(logits_a), np.asarray(logits_b)[:, :6], rtol=1e-5, atol=1e-5
        )


class TestKVCache:
    def test_prefill_plus_decode_equals_full_forward(self, rng):
        import jax

        cfg = TINY
        params = init_mistral(cfg, jax.random.PRNGKey(1))
        B, T_prefill, T_total = 2, 5, 9
        ids = rng.integers(0, cfg.vocab_size, (B, T_total))

        # Full forward (no cache).
        pos = jnp.broadcast_to(jnp.arange(T_total), (B, T_total))
        full_logits, _ = mistral_forward(params, embed(params, jnp.asarray(ids)), cfg, pos)

        # Prefill then decode token by token.
        cache = init_cache(cfg, B, max_len=16, dtype=jnp.float32)
        pre_pos = jnp.broadcast_to(jnp.arange(T_prefill), (B, T_prefill))
        logits_p, cache = mistral_forward(
            params, embed(params, jnp.asarray(ids[:, :T_prefill])), cfg, pre_pos, cache=cache
        )
        np.testing.assert_allclose(
            np.asarray(logits_p), np.asarray(full_logits[:, :T_prefill]), rtol=2e-5, atol=2e-5
        )

        for t in range(T_prefill, T_total):
            step_pos = jnp.full((B, 1), t)
            logits_t, cache = mistral_forward(
                params, embed(params, jnp.asarray(ids[:, t : t + 1])), cfg, step_pos, cache=cache
            )
            np.testing.assert_allclose(
                np.asarray(logits_t[:, 0]), np.asarray(full_logits[:, t]), rtol=2e-5, atol=2e-5
            )
        assert int(cache["length"][0]) == T_total

    def test_ragged_prefill_decode(self, rng):
        """Samples with different prompt lengths share one padded prefill."""
        import jax

        cfg = TINY
        params = init_mistral(cfg, jax.random.PRNGKey(2))
        lens = [4, 7]
        T = max(lens)
        ids = rng.integers(0, cfg.vocab_size, (2, T))

        valid = jnp.asarray([[i < L for i in range(T)] for L in lens])
        pos = jnp.broadcast_to(jnp.arange(T), (2, T))
        cache = init_cache(cfg, 2, max_len=16, dtype=jnp.float32)
        _, cache = mistral_forward(
            params, embed(params, jnp.asarray(ids)), cfg, pos, attn_valid=valid, cache=cache
        )
        np.testing.assert_array_equal(np.asarray(cache["length"]), lens)

        #

        # Decode one step per sample at its own position.
        step_pos = jnp.asarray([[lens[0]], [lens[1]]])
        tok = rng.integers(0, cfg.vocab_size, (2, 1))
        logits_step, cache = mistral_forward(
            params, embed(params, jnp.asarray(tok)), cfg, step_pos, cache=cache
        )

        # Oracle: run each sample unpadded through the no-cache path.
        for b, L in enumerate(lens):
            seq = np.concatenate([ids[b, :L], tok[b]])[None]
            opos = jnp.arange(L + 1)[None]
            oracle, _ = mistral_forward(params, embed(params, jnp.asarray(seq)), cfg, opos)
            np.testing.assert_allclose(
                np.asarray(logits_step[b, 0]), np.asarray(oracle[0, -1]), rtol=2e-5, atol=2e-5
            )
