"""Chunked prefill admission: long prompts admit in chunks interleaved with
decode steps, token streams stay EXACTLY equal to whole-prompt prefill."""

import jax.numpy as jnp
import numpy as np
import pytest

import jax

from vis_zephyr_tpu.config import tiny_config
from vis_zephyr_tpu.constants import IMAGE_TOKEN_INDEX
from vis_zephyr_tpu.models.vis_zephyr import init_vis_zephyr
from vis_zephyr_tpu.serve.batching import ContinuousBatcher
from vis_zephyr_tpu.serve.paged import PagedBatcher
from vis_zephyr_tpu.serve.generate import SamplingConfig, generate


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_config()
    params = init_vis_zephyr(cfg, jax.random.PRNGKey(0))
    return cfg, params


def make_request(cfg, rng, T, with_image=False, P=3):
    H = cfg.vision.image_size
    ids = rng.integers(5, cfg.decoder.vocab_size, (T,))
    images = patch_valid = None
    if with_image:
        ids[1] = IMAGE_TOKEN_INDEX
        images = rng.standard_normal((P, H, H, 3)).astype(np.float32)
        patch_valid = np.ones((P,), bool)
    return ids, images, patch_valid


SAMPLING = SamplingConfig(max_new_tokens=5, temperature=0.0, eos_token_id=-1)


def _check_exact(batcher, cfg, params, requests, handles, cache_len):
    batcher.run_until_drained()
    for (ids, im, pv), h in zip(requests, handles):
        solo = generate(
            params, jnp.asarray(ids[None]),
            None if im is None else jnp.asarray(im[None]),
            None if pv is None else jnp.asarray(pv[None]),
            cfg, SAMPLING, cache_len=cache_len,
        )[0]
        np.testing.assert_array_equal(list(batcher.stream(h)), solo)


class TestChunkedPrefill:
    def test_dense_long_prompt_exact(self, setup, rng):
        cfg, params = setup
        batcher = ContinuousBatcher(
            params, cfg, max_slots=4, cache_len=256, sampling=SAMPLING,
            prefill_chunk=16,
        )
        # 40 text tokens → 3 chunks of 16; plus a short multimodal request.
        requests = [
            make_request(cfg, rng, 40, with_image=False),
            make_request(cfg, rng, 6, with_image=True),
        ]
        handles = [batcher.submit(ids, im, pv) for ids, im, pv in requests]
        _check_exact(batcher, cfg, params, requests, handles, 256)

    def test_dense_decode_not_stalled_during_prefill(self, setup, rng):
        """Active slots keep producing tokens while a long prompt admits."""
        cfg, params = setup
        batcher = ContinuousBatcher(
            params, cfg, max_slots=4, cache_len=256, sampling=SAMPLING,
            prefill_chunk=16,
        )
        r1 = make_request(cfg, rng, 5)
        h1 = batcher.submit(*r1)
        batcher.step()  # begin r1 prefill (short: 1 chunk)
        batcher.step()  # finish admit + first decode
        assert batcher.active.any()
        r2 = make_request(cfg, rng, 40)
        h2 = batcher.submit(*r2)
        produced_during_admit = 0
        # r2 needs ~4 scheduler steps to admit (splice + 3 chunks); r1 must
        # receive a token on each of those steps.
        for _ in range(3):
            before = r1_q = h1.out.qsize()
            batcher.step()
            if h1.out.qsize() > before:
                produced_during_admit += 1
        assert produced_during_admit >= 2, "decode stalled during chunked prefill"
        _check_exact(batcher, cfg, params, [r1, r2], [h1, h2], 256)

    def test_paged_long_prompt_exact(self, setup, rng):
        cfg, params = setup
        batcher = PagedBatcher(
            params, cfg, max_slots=4, cache_len=64, page_size=16,
            sampling=SAMPLING, num_pages=32, prefill_chunk=16,
        )
        requests = [
            make_request(cfg, rng, 40, with_image=False),
            make_request(cfg, rng, 7, with_image=True),
        ]
        handles = [batcher.submit(ids, im, pv) for ids, im, pv in requests]
        _check_exact(batcher, cfg, params, requests, handles, 64)

    def test_paged_install_retries_on_pool_exhaustion(self, setup, rng):
        cfg, params = setup
        sampling = SamplingConfig(max_new_tokens=17, temperature=0.0, eos_token_id=-1)
        batcher = PagedBatcher(
            params, cfg, max_slots=4, cache_len=48, page_size=16,
            sampling=sampling, num_pages=3, prefill_chunk=16,
        )
        h1 = batcher.submit(*make_request(cfg, rng, 5))
        h2 = batcher.submit(*make_request(cfg, rng, 6))
        batcher.run_until_drained()
        assert len(list(batcher.stream(h1))) == 17
        assert len(list(batcher.stream(h2))) == 17
        assert batcher.allocator.available == 2
