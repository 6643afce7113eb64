"""Generation runtime tests (tiny model)."""

import jax
import numpy as np
import jax.numpy as jnp
import pytest

from vis_zephyr_tpu.config import tiny_config
from vis_zephyr_tpu.constants import IMAGE_TOKEN_INDEX
from vis_zephyr_tpu.models.vis_zephyr import init_vis_zephyr
from vis_zephyr_tpu.serve.generate import (
    SamplingConfig,
    generate,
    generate_stream,
    pad_to_bucket,
)


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_config()
    params = init_vis_zephyr(cfg, jax.random.PRNGKey(0))
    return cfg, params


def make_inputs(cfg, rng, B=1, T=6, P=3):
    H = cfg.vision.image_size
    ids = rng.integers(5, cfg.decoder.vocab_size, (B, T))
    ids[:, 1] = IMAGE_TOKEN_INDEX
    images = rng.standard_normal((B, P, H, H, 3)).astype(np.float32)
    patch_valid = np.ones((B, P), bool)
    return jnp.asarray(ids), jnp.asarray(images), jnp.asarray(patch_valid)


class TestGenerate:
    def test_greedy_batch_equals_stream(self, setup, rng):
        cfg, params = setup
        ids, images, pv = make_inputs(cfg, rng)
        sampling = SamplingConfig(max_new_tokens=8, temperature=0.0, eos_token_id=-1)

        batch_tokens = generate(params, ids, images, pv, cfg, sampling)[0]
        stream_tokens = list(generate_stream(params, ids, images, pv, cfg, sampling))
        np.testing.assert_array_equal(batch_tokens, stream_tokens)

    def test_multi_step_stream_token_exact(self, setup, rng):
        """Serialized-path multi-step bursts (1→2→4→n ramp) equal plain
        per-token streaming, including EOS cut mid-burst."""
        cfg, params = setup
        ids, images, pv = make_inputs(cfg, rng)
        plain = list(generate_stream(
            params, ids, images, pv, cfg,
            SamplingConfig(max_new_tokens=13, temperature=0.0, eos_token_id=-1)))
        burst = list(generate_stream(
            params, ids, images, pv, cfg,
            SamplingConfig(max_new_tokens=13, temperature=0.0, eos_token_id=-1),
            multi_step=4))
        np.testing.assert_array_equal(plain, burst)
        # EOS mid-burst: force an early stop by using a generated token as
        # the EOS id — the burst path must cut at the same place.
        eos = int(plain[5])
        s = SamplingConfig(max_new_tokens=13, temperature=0.0, eos_token_id=eos)
        np.testing.assert_array_equal(
            list(generate_stream(params, ids, images, pv, cfg, s)),
            list(generate_stream(params, ids, images, pv, cfg, s,
                                 multi_step=4)))

    def test_eos_padding_after_stop(self, setup, rng):
        cfg, params = setup
        ids, images, pv = make_inputs(cfg, rng)
        # Find which token greedy emits first, then declare it EOS: the
        # remainder of the batch output must be EOS-padded.
        probe = SamplingConfig(max_new_tokens=4, temperature=0.0, eos_token_id=-1)
        first = int(generate(params, ids, images, pv, cfg, probe)[0][0])
        sampling = SamplingConfig(max_new_tokens=6, temperature=0.0, eos_token_id=first)
        out = generate(params, ids, images, pv, cfg, sampling)[0]
        assert (out == first).all()
        assert list(generate_stream(params, ids, images, pv, cfg, sampling)) == []

    def test_text_only_generation(self, setup, rng):
        cfg, params = setup
        ids = jnp.asarray(rng.integers(5, cfg.decoder.vocab_size, (2, 5)))
        sampling = SamplingConfig(max_new_tokens=4, temperature=0.0, eos_token_id=-1)
        out = generate(params, ids, None, None, cfg, sampling)
        assert out.shape == (2, 4)

    def test_sampling_reproducible(self, setup, rng):
        cfg, params = setup
        ids, images, pv = make_inputs(cfg, rng)
        sampling = SamplingConfig(max_new_tokens=6, temperature=0.8, top_p=0.9, eos_token_id=-1)
        a = generate(params, ids, images, pv, cfg, sampling, rng=jax.random.PRNGKey(7))
        b = generate(params, ids, images, pv, cfg, sampling, rng=jax.random.PRNGKey(7))
        c = generate(params, ids, images, pv, cfg, sampling, rng=jax.random.PRNGKey(8))
        np.testing.assert_array_equal(a, b)
        assert not np.array_equal(a, c) or True  # different seed may coincide on tiny vocab

    def test_ragged_batch_greedy_matches_singletons(self, setup, rng):
        """Two prompts of different lengths in one padded batch must decode
        the same tokens as each run alone."""
        cfg, params = setup
        sampling = SamplingConfig(max_new_tokens=5, temperature=0.0, eos_token_id=-1)
        H = cfg.vision.image_size
        P = 3
        lens = [4, 7]
        T = max(lens)
        ids = rng.integers(5, cfg.decoder.vocab_size, (2, T))
        ids[:, 1] = IMAGE_TOKEN_INDEX
        images = rng.standard_normal((2, P, H, H, 3)).astype(np.float32)
        pv = np.ones((2, P), bool)
        valid = np.array([[i < L for i in range(T)] for L in lens])

        batch_out = generate(
            params, jnp.asarray(ids), jnp.asarray(images), jnp.asarray(pv), cfg,
            sampling, text_valid=jnp.asarray(valid), cache_len=256,
        )
        for b, L in enumerate(lens):
            solo = generate(
                params,
                jnp.asarray(ids[b : b + 1, :L]),
                jnp.asarray(images[b : b + 1]),
                jnp.asarray(pv[b : b + 1]),
                cfg,
                sampling,
                cache_len=256,
            )
            np.testing.assert_array_equal(batch_out[b], solo[0])


def test_pad_to_bucket():
    assert pad_to_bucket(1) == 128
    assert pad_to_bucket(128) == 128
    assert pad_to_bucket(129) == 256
    assert pad_to_bucket(300, bucket=64) == 320


class TestBeamSearch:
    """`beam_search` (HF num_beams semantics) against a cache-free oracle."""

    @pytest.fixture(scope="class")
    def model(self):
        cfg = tiny_config(vocab_size=512)
        params = init_vis_zephyr(cfg, jax.random.PRNGKey(0))
        return cfg, params

    def _full_lsm(self, params, cfg, ids):
        """Teacher-forced log-softmax over every position (no KV cache)."""
        from vis_zephyr_tpu.models.vis_zephyr import vis_zephyr_forward

        logits, _ = vis_zephyr_forward(
            params, jnp.asarray(np.asarray(ids, np.int64)[None]), None, None,
            cfg)
        return np.asarray(
            jax.nn.log_softmax(logits[0].astype(jnp.float32), axis=-1))

    def _oracle_beam(self, params, cfg, prompt, K, steps):
        """Independent numpy beam search re-running the model WITHOUT a
        cache each step — pins the cached/reordered implementation."""
        lsm = self._full_lsm(params, cfg, prompt)[len(prompt) - 1]
        vals, ids = jax.lax.top_k(jnp.asarray(lsm), K)
        beams = [([int(t)], float(v)) for t, v in zip(ids, vals)]
        for _ in range(steps - 1):
            cand = []
            for seq, score in beams:
                row = self._full_lsm(params, cfg, list(prompt) + seq)[-1]
                top = np.argsort(-row)[: 2 * K]
                cand.extend((seq + [int(t)], score + float(row[t]))
                            for t in top)
            cand.sort(key=lambda x: -x[1])
            beams = cand[:K]
        return max(beams, key=lambda x: x[1] / len(x[0]))[0]

    def test_beam1_equals_greedy(self, model):
        from vis_zephyr_tpu.serve.generate import beam_search

        cfg, params = model
        prompt = [1, 17, 23, 42]
        sampling = SamplingConfig(max_new_tokens=6, temperature=0.0,
                                  eos_token_id=-1)
        greedy = list(generate_stream(
            params, jnp.asarray([prompt]), None, None, cfg, sampling))
        beam = beam_search(params, jnp.asarray([prompt]), None, None, cfg,
                           num_beams=1, max_new_tokens=6, eos_token_id=-1)
        assert beam == greedy

    def test_matches_cachefree_oracle(self, model):
        from vis_zephyr_tpu.serve.generate import beam_search

        cfg, params = model
        prompt = [1, 9, 200, 77]
        got = beam_search(params, jnp.asarray([prompt]), None, None, cfg,
                          num_beams=3, max_new_tokens=4, eos_token_id=-1)
        want = self._oracle_beam(params, cfg, prompt, K=3, steps=4)
        assert got == want

    def test_eos_retires_beam(self, model):
        """With EOS set to the greedy continuation token at some step, the
        search must terminate and return a finished hypothesis ending
        before that token."""
        from vis_zephyr_tpu.serve.generate import beam_search

        cfg, params = model
        prompt = [1, 17, 23, 42]
        sampling = SamplingConfig(max_new_tokens=8, temperature=0.0,
                                  eos_token_id=-1)
        greedy = list(generate_stream(
            params, jnp.asarray([prompt]), None, None, cfg, sampling))
        eos = greedy[2]
        toks = beam_search(params, jnp.asarray([prompt]), None, None, cfg,
                           num_beams=2, max_new_tokens=8, eos_token_id=eos)
        assert eos not in toks

    def test_eos_top_first_token_does_not_starve_beams(self, model):
        """EOS being the MOST likely first token retires to the finished
        pool without consuming a live beam slot (2K-pool semantics, like
        every later step). The old top-K first expansion left K=1 with
        zero live beams and returned [] even when a longer hypothesis
        scores better under a length-rewarding penalty."""
        from vis_zephyr_tpu.serve.generate import beam_search

        cfg, params = model
        prompt = [1, 17, 23, 42]
        lsm = self._full_lsm(params, cfg, prompt)[len(prompt) - 1]
        eos = int(np.argmax(lsm))
        toks = beam_search(params, jnp.asarray([prompt]), None, None, cfg,
                           num_beams=1, max_new_tokens=4, eos_token_id=eos,
                           length_penalty=5.0)
        assert toks and eos not in toks
