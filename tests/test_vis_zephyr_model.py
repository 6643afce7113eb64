"""End-to-end consistency tests of the fused multimodal model (tiny config)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vis_zephyr_tpu.config import tiny_config
from vis_zephyr_tpu.constants import IGNORE_INDEX, IMAGE_TOKEN_INDEX
from vis_zephyr_tpu.models.mistral import init_cache
from vis_zephyr_tpu.models.vis_zephyr import init_vis_zephyr, vis_zephyr_forward


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_config()
    params = init_vis_zephyr(cfg, jax.random.PRNGKey(0))
    return cfg, params


def make_batch(cfg, rng, B=2, T=6, P=3):
    H = cfg.vision.image_size
    ids = rng.integers(5, cfg.decoder.vocab_size, (B, T))
    ids[:, 1] = IMAGE_TOKEN_INDEX
    images = rng.standard_normal((B, P, H, H, 3)).astype(np.float32)
    patch_valid = np.ones((B, P), bool)
    patch_valid[1, 2] = False  # ragged patch counts
    labels = rng.integers(5, cfg.decoder.vocab_size, (B, T))
    return (
        jnp.asarray(ids),
        jnp.asarray(images),
        jnp.asarray(patch_valid),
        jnp.asarray(labels),
    )


class TestVisZephyrForward:
    def test_shapes_and_labels(self, setup, rng):
        cfg, params = setup
        ids, images, patch_valid, labels = make_batch(cfg, rng)
        logits, aux = vis_zephyr_forward(
            params, ids, images, patch_valid, cfg, labels=labels
        )
        B, T = ids.shape
        Q = cfg.projector.num_queries
        P = images.shape[1]
        T_out = T - 1 + P * Q
        assert logits.shape == (B, T_out, cfg.decoder.vocab_size)
        # Sample 0: 3 valid patches → 5 text + 24 image tokens.
        assert int(aux["lengths"][0]) == (T - 1) + 3 * Q
        assert int(aux["lengths"][1]) == (T - 1) + 2 * Q
        # Image spans carry IGNORE labels.
        lab0 = np.asarray(aux["labels"][0])
        assert (lab0[1 : 1 + 3 * Q] == IGNORE_INDEX).all()

    def test_jit_compiles_once_and_matches_eager(self, setup, rng):
        cfg, params = setup
        ids, images, patch_valid, labels = make_batch(cfg, rng)
        eager_logits, _ = vis_zephyr_forward(params, ids, images, patch_valid, cfg)

        jitted = jax.jit(
            lambda p, i, im, pv: vis_zephyr_forward(p, i, im, pv, cfg)[0]
        )
        jit_logits = jitted(params, ids, images, patch_valid)
        np.testing.assert_allclose(
            np.asarray(eager_logits), np.asarray(jit_logits), rtol=1e-5, atol=1e-5
        )

    def test_invalid_patch_content_does_not_affect_output(self, setup, rng):
        cfg, params = setup
        ids, images, patch_valid, _ = make_batch(cfg, rng)
        logits_a, aux_a = vis_zephyr_forward(params, ids, images, patch_valid, cfg)
        # Scramble the invalid patch of sample 1.
        images_b = np.asarray(images).copy()
        images_b[1, 2] = 123.0
        logits_b, _ = vis_zephyr_forward(
            params, ids, jnp.asarray(images_b), patch_valid, cfg
        )
        L = int(aux_a["lengths"][1])
        np.testing.assert_allclose(
            np.asarray(logits_a[1, :L]), np.asarray(logits_b[1, :L]), rtol=1e-5, atol=1e-5
        )

    def test_text_only_path(self, setup, rng):
        cfg, params = setup
        ids = jnp.asarray(rng.integers(5, cfg.decoder.vocab_size, (2, 6)))
        logits, aux = vis_zephyr_forward(params, ids, None, None, cfg)
        assert logits.shape == (2, 6, cfg.decoder.vocab_size)
        assert "cache" not in aux

    def test_prefill_with_cache_then_decode(self, setup, rng):
        cfg, params = setup
        ids, images, patch_valid, _ = make_batch(cfg, rng)
        B, T = ids.shape
        P, Q = images.shape[1], cfg.projector.num_queries
        max_len = T - 1 + P * Q + 8

        cache = init_cache(cfg.decoder, B, max_len, dtype=jnp.float32)
        logits, aux = vis_zephyr_forward(
            params, ids, images, patch_valid, cfg, cache=cache
        )
        cache = aux["cache"]
        np.testing.assert_array_equal(
            np.asarray(cache["length"]), np.asarray(aux["lengths"])
        )

        # The no-cache path must agree with the cached prefill on valid slots.
        logits_ref, aux_ref = vis_zephyr_forward(params, ids, images, patch_valid, cfg)
        L0 = int(aux_ref["lengths"][0])
        np.testing.assert_allclose(
            np.asarray(logits[0, :L0]), np.asarray(logits_ref[0, :L0]), rtol=2e-5, atol=2e-5
        )


class TestInitializeVisionTokenizer:
    def test_adds_tokens_and_mean_inits(self, mock_tokenizer):
        import jax

        from vis_zephyr_tpu.config import tiny_config
        from vis_zephyr_tpu.constants import (
            DEFAULT_IM_END_TOKEN,
            DEFAULT_IM_START_TOKEN,
            DEFAULT_IMAGE_PATCH_TOKEN,
        )
        from vis_zephyr_tpu.models.vis_zephyr import (
            init_vis_zephyr,
            initialize_vision_tokenizer,
        )

        class Tok:
            """HF-ish add_tokens/len surface over the mock tokenizer."""

            def __init__(self, base_vocab):
                self.vocab = dict(base_vocab)

            def add_tokens(self, tokens, special_tokens=True):
                added = 0
                for t in tokens:
                    if t not in self.vocab:
                        self.vocab[t] = len(self.vocab)
                        added += 1
                return added

            def __len__(self):
                return len(self.vocab)

        cfg = tiny_config()
        params = init_vis_zephyr(cfg, jax.random.PRNGKey(0))
        V = cfg.decoder.vocab_size
        tok = Tok({f"w{i}": i for i in range(V)})

        new_params, n_new = initialize_vision_tokenizer(
            params, tok, mm_use_im_patch_token=True, mm_use_im_start_end=True
        )
        assert n_new == 3
        assert DEFAULT_IMAGE_PATCH_TOKEN in tok.vocab
        assert DEFAULT_IM_START_TOKEN in tok.vocab and DEFAULT_IM_END_TOKEN in tok.vocab

        embed = np.asarray(new_params["decoder"]["embed_tokens"])
        head = np.asarray(new_params["decoder"]["lm_head"]["kernel"])
        assert embed.shape[0] == V + 3 and head.shape[1] == V + 3
        old_mean = np.asarray(params["decoder"]["embed_tokens"]).mean(axis=0)
        for r in range(1, 4):
            np.testing.assert_allclose(embed[-r], old_mean, rtol=1e-5, atol=1e-6)

        # Idempotent: tables already cover the tokenizer → no-op.
        again, n2 = initialize_vision_tokenizer(
            new_params, tok, mm_use_im_patch_token=True, mm_use_im_start_end=True
        )
        assert n2 == 0
        assert np.asarray(again["decoder"]["embed_tokens"]).shape[0] == V + 3

    def test_pretrained_embed_override(self):
        import jax
        import jax.numpy as jnp

        from vis_zephyr_tpu.config import tiny_config
        from vis_zephyr_tpu.models.vis_zephyr import (
            init_vis_zephyr,
            initialize_vision_tokenizer,
        )

        class Tok:
            def __init__(self, n):
                self.n = n

            def add_tokens(self, tokens, special_tokens=True):
                self.n += len(tokens)
                return len(tokens)

            def __len__(self):
                return self.n

        cfg = tiny_config()
        params = init_vis_zephyr(cfg, jax.random.PRNGKey(0))
        pre = jnp.ones((2, cfg.decoder.hidden_size)) * 7.0
        new_params, n_new = initialize_vision_tokenizer(
            params, Tok(cfg.decoder.vocab_size), mm_use_im_start_end=True,
            pretrained_embed_tokens=pre,
        )
        assert n_new == 2
        np.testing.assert_allclose(
            np.asarray(new_params["decoder"]["embed_tokens"][-2:]), 7.0
        )
