"""Prompt-lookup speculative decoding (serve/generate.py).

Invariants:
- `decode_verify` over S appended tokens produces, position by position,
  the same logits as S sequential `decode_step` calls (same cache writes,
  masks, and RoPE positions).
- `generate_stream(lookahead=k)` is token-identical to plain greedy
  streaming — speculation changes the number of device steps, never the
  output.
- `_propose_lookup` proposes the continuation of the most recent matching
  n-gram.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vis_zephyr_tpu.config import tiny_config
from vis_zephyr_tpu.constants import IMAGE_TOKEN_INDEX
from vis_zephyr_tpu.models.vis_zephyr import init_vis_zephyr
from vis_zephyr_tpu.serve.generate import (
    SamplingConfig,
    _propose_lookup,
    decode_step,
    decode_verify,
    generate_stream,
    prefill,
)


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_config()
    params = init_vis_zephyr(cfg, jax.random.PRNGKey(0))
    return cfg, params


class TestProposeLookup:
    def test_finds_most_recent_match(self):
        h = np.array([5, 6, 7, 9, 5, 6, 8, 3, 5, 6])
        # Tail (5, 6) last occurred at index 4 → continuation starts at 8.
        np.testing.assert_array_equal(
            _propose_lookup(h, ngram=2, span=3), [8, 3, 5]
        )

    def test_no_match(self):
        assert _propose_lookup(np.array([1, 2, 3, 4]), ngram=2) is None

    def test_short_history(self):
        assert _propose_lookup(np.array([1, 2]), ngram=2) is None


class TestDecodeVerify:
    def test_matches_sequential_decode_steps(self, setup, rng):
        cfg, params = setup
        ids = jnp.asarray(rng.integers(5, cfg.decoder.vocab_size, (1, 7)))
        _, cache, _ = prefill(params, ids, None, None, cfg, cache_len=64)
        toks = rng.integers(5, cfg.decoder.vocab_size, (1, 4)).astype(np.int32)

        # Sequential: four single-token steps.
        seq_cache = jax.tree.map(lambda x: x, cache)
        seq_logits = []
        for i in range(4):
            lg, seq_cache = decode_step(
                params, seq_cache, jnp.asarray(toks[:, i]), cfg
            )
            seq_logits.append(np.asarray(lg))

        # One verify append of the same four tokens.
        valid = jnp.ones((1, 4), bool)
        vlogits, vcache = decode_verify(
            params, cache, jnp.asarray(toks), valid, cfg
        )
        for i in range(4):
            np.testing.assert_allclose(
                np.asarray(vlogits[:, i]), seq_logits[i], rtol=2e-4, atol=2e-4
            )
        assert int(vcache["length"][0]) == int(seq_cache["length"][0])

    def test_padded_tail_does_not_change_logits(self, setup, rng):
        cfg, params = setup
        ids = jnp.asarray(rng.integers(5, cfg.decoder.vocab_size, (1, 5)))
        _, cache, _ = prefill(params, ids, None, None, cfg, cache_len=64)
        toks = rng.integers(5, cfg.decoder.vocab_size, (1, 2)).astype(np.int32)

        full_logits, _ = decode_verify(
            params, cache, jnp.asarray(toks), jnp.ones((1, 2), bool), cfg
        )
        padded = np.concatenate(
            [toks, np.zeros((1, 3), np.int32)], axis=1
        )
        valid = np.array([[True, True, False, False, False]])
        pad_logits, _ = decode_verify(
            params, cache, jnp.asarray(padded), jnp.asarray(valid), cfg
        )
        np.testing.assert_allclose(
            np.asarray(pad_logits[:, :2]), np.asarray(full_logits),
            rtol=2e-4, atol=2e-4,
        )


class TestSpeculativeStream:
    def _stream(self, setup, ids, images, pv, lookahead, max_new=12):
        cfg, params = setup
        sampling = SamplingConfig(
            max_new_tokens=max_new, temperature=0.0, eos_token_id=-1
        )
        return list(
            generate_stream(
                params, ids, images, pv, cfg, sampling,
                cache_len=128, lookahead=lookahead,
            )
        )

    def test_token_identical_text_only(self, setup, rng):
        cfg, _ = setup
        ids = jnp.asarray(rng.integers(5, cfg.decoder.vocab_size, (1, 9)))
        base = self._stream(setup, ids, None, None, lookahead=0)
        spec = self._stream(setup, ids, None, None, lookahead=4)
        assert base == spec

    def test_token_identical_repetitive_prompt(self, setup):
        cfg, _ = setup
        # Strong n-gram structure: proposals fire every step.
        pat = [7, 8, 9, 10, 7, 8, 9, 10, 7, 8, 9, 10, 7, 8]
        ids = jnp.asarray(np.array(pat)[None])
        base = self._stream(setup, ids, None, None, lookahead=0, max_new=16)
        spec = self._stream(setup, ids, None, None, lookahead=6, max_new=16)
        assert base == spec

    def test_token_identical_with_image(self, setup, rng):
        cfg, _ = setup
        H = cfg.vision.image_size
        ids = np.array(rng.integers(5, cfg.decoder.vocab_size, (12,)))
        ids[1] = IMAGE_TOKEN_INDEX
        images = rng.standard_normal((1, 3, H, H, 3)).astype(np.float32)
        pv = np.ones((1, 3), bool)
        base = self._stream(setup, jnp.asarray(ids[None]), jnp.asarray(images),
                            jnp.asarray(pv), lookahead=0)
        spec = self._stream(setup, jnp.asarray(ids[None]), jnp.asarray(images),
                            jnp.asarray(pv), lookahead=4)
        assert base == spec
