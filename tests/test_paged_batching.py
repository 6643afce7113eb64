"""Paged-KV continuous batching tests (tiny model, CPU interpret kernel).

The invariant throughout: paged decoding is bit-identical to the dense-cache
path, which is itself parity-tested against solo `generate`.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vis_zephyr_tpu.config import tiny_config
from vis_zephyr_tpu.constants import IMAGE_TOKEN_INDEX
from vis_zephyr_tpu.models.vis_zephyr import init_vis_zephyr
from vis_zephyr_tpu.serve.paged import PageAllocator, PagedBatcher
from vis_zephyr_tpu.serve.generate import SamplingConfig, generate


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_config()
    params = init_vis_zephyr(cfg, jax.random.PRNGKey(0))
    return cfg, params


def make_request(cfg, rng, T, with_image=True, P=3):
    H = cfg.vision.image_size
    ids = rng.integers(5, cfg.decoder.vocab_size, (T,))
    images = patch_valid = None
    if with_image:
        ids[1] = IMAGE_TOKEN_INDEX
        images = rng.standard_normal((P, H, H, 3)).astype(np.float32)
        patch_valid = np.ones((P,), bool)
    return ids, images, patch_valid


class TestPageAllocator:
    def test_reserves_trash_page(self):
        a = PageAllocator(4)
        got = a.alloc(3)
        assert sorted(got) == [1, 2, 3]  # page 0 never handed out
        assert a.alloc(1) is None
        a.release(got)
        assert a.available == 3

    def test_prefers_contiguous_runs(self):
        """Fresh pool → ascending runs (the decode kernel's single-DMA fast
        path); a later exact-fit hole is found first-fit."""
        a = PageAllocator(16)
        r1 = a.alloc(4)
        r2 = a.alloc(4)
        assert r1 == [1, 2, 3, 4] and r2 == [5, 6, 7, 8]
        a.release(r1)
        r3 = a.alloc(3)           # fits inside the released [1..4] hole
        assert r3 == [1, 2, 3]
        r4 = a.alloc(5)           # first run of 5 is [9..13]
        assert r4 == [9, 10, 11, 12, 13]

    def test_fragmented_fallback_allocates_scattered(self):
        a = PageAllocator(8)      # free: 1..7
        held = a.alloc(3)         # [1,2,3]
        rest = a.alloc(4)         # [4,5,6,7]
        a.release([held[0], held[2]])  # free: {1, 3} — no run of 2
        got = a.alloc(2)
        assert got == [1, 3]      # scattered, still served
        assert a.available == 0


class TestPagedBatcher:
    def test_matches_standalone_generate(self, setup, rng):
        cfg, params = setup
        sampling = SamplingConfig(max_new_tokens=6, temperature=0.0, eos_token_id=-1)
        batcher = PagedBatcher(
            params, cfg, max_slots=4, cache_len=64, page_size=16,
            sampling=sampling, num_pages=32,
        )
        requests = [make_request(cfg, rng, T, with_image=True) for T in (5, 8, 6)]
        handles = [batcher.submit(ids, im, pv) for ids, im, pv in requests]
        batcher.run_until_drained()

        for (ids, im, pv), handle in zip(requests, handles):
            got = list(batcher.stream(handle))
            solo = generate(
                params, jnp.asarray(ids[None]), jnp.asarray(im[None]),
                jnp.asarray(pv[None]), cfg, sampling, cache_len=64,
            )[0]
            np.testing.assert_array_equal(got, solo)

    def test_page_reuse_across_requests(self, setup, rng):
        """More requests than the pool can hold at once: freed pages are
        re-allocated to later requests and outputs stay exact."""
        cfg, params = setup
        sampling = SamplingConfig(max_new_tokens=4, temperature=0.0, eos_token_id=-1)
        # Pool fits ~2 requests at a time (each needs 1-2 pages of 16).
        batcher = PagedBatcher(
            params, cfg, max_slots=2, cache_len=32, page_size=16,
            sampling=sampling, num_pages=5,
        )
        requests = [make_request(cfg, rng, 4 + i, with_image=False) for i in range(5)]
        handles = [batcher.submit(ids, im, pv) for ids, im, pv in requests]
        batcher.run_until_drained()
        for (ids, im, pv), h in zip(requests, handles):
            got = list(batcher.stream(h))
            solo = generate(
                params, jnp.asarray(ids[None]), None, None, cfg, sampling, cache_len=32
            )[0]
            np.testing.assert_array_equal(got, solo)
        assert not batcher.active.any()
        assert batcher.allocator.available == 4  # everything released

    def test_pool_exhaustion_requeues(self, setup, rng):
        cfg, params = setup
        sampling = SamplingConfig(max_new_tokens=17, temperature=0.0, eos_token_id=-1)
        # Each request needs ceil((len+17)/16) = 2+ pages; pool has 2 usable.
        batcher = PagedBatcher(
            params, cfg, max_slots=4, cache_len=48, page_size=16,
            sampling=sampling, num_pages=3,
        )
        h1 = batcher.submit(*make_request(cfg, rng, 5, with_image=False))
        h2 = batcher.submit(*make_request(cfg, rng, 6, with_image=False))
        batcher.step()
        # Only one fits; the other is requeued, not dropped.
        assert batcher.active.sum() == 1
        assert len(batcher._requeued) == 1
        batcher.run_until_drained()
        assert len(list(batcher.stream(h1))) == 17
        assert len(list(batcher.stream(h2))) == 17

    def test_single_token_budget(self, setup, rng):
        cfg, params = setup
        sampling = SamplingConfig(max_new_tokens=1, temperature=0.0, eos_token_id=-1)
        batcher = PagedBatcher(
            params, cfg, max_slots=2, cache_len=32, page_size=16,
            sampling=sampling, num_pages=8,
        )
        h = batcher.submit(*make_request(cfg, rng, 5, with_image=False))
        batcher.run_until_drained()
        assert len(list(batcher.stream(h))) == 1
        assert batcher.allocator.available == 7

    def test_too_long_request_rejected(self, setup, rng):
        cfg, params = setup
        sampling = SamplingConfig(max_new_tokens=200, temperature=0.0, eos_token_id=-1)
        batcher = PagedBatcher(
            params, cfg, max_slots=2, cache_len=32, page_size=16,
            sampling=sampling, num_pages=8,
        )
        h = batcher.submit(*make_request(cfg, rng, 10, with_image=False))
        batcher.run_until_drained()
        assert list(batcher.stream(h)) == []

    def test_interleaved_submission(self, setup, rng):
        cfg, params = setup
        sampling = SamplingConfig(max_new_tokens=5, temperature=0.0, eos_token_id=-1)
        batcher = PagedBatcher(
            params, cfg, max_slots=4, cache_len=64, page_size=16,
            sampling=sampling, num_pages=32,
        )
        r1 = make_request(cfg, rng, 5, with_image=False)
        r2 = make_request(cfg, rng, 7, with_image=False)
        h1 = batcher.submit(*r1)
        batcher.step()
        batcher.step()  # r1 mid-decode when r2 arrives
        h2 = batcher.submit(*r2)
        batcher.run_until_drained()
        for r, h in ((r1, h1), (r2, h2)):
            ids, im, pv = r
            solo = generate(
                params, jnp.asarray(ids[None]), None, None, cfg, sampling, cache_len=64
            )[0]
            np.testing.assert_array_equal(list(batcher.stream(h)), solo)


class TestMultiStepPaged:
    """Multi-step bursts (`multi_step=n`: n decode steps per dispatch) must
    be token-exact with single-stepping: the scan's alive/steps_left carry
    freezes slots at EOS/budget exhaustion mid-burst exactly where the host
    would have finished them."""

    @pytest.mark.parametrize("kv_quant", [False, True])
    def test_matches_standalone_generate(self, setup, rng, kv_quant):
        cfg, params = setup
        sampling = SamplingConfig(max_new_tokens=6, temperature=0.0,
                                  eos_token_id=-1)
        batcher = PagedBatcher(
            params, cfg, max_slots=4, cache_len=64, page_size=16,
            sampling=sampling, num_pages=32, multi_step=4,
            kv_quant=kv_quant,
        )
        requests = [make_request(cfg, rng, T, with_image=not kv_quant)
                    for T in (5, 8, 6)]
        handles = [batcher.submit(ids, im, pv) for ids, im, pv in requests]
        batcher.run_until_drained()
        for (ids, im, pv), handle in zip(requests, handles):
            got = list(batcher.stream(handle))
            im_j = None if im is None else jnp.asarray(im[None])
            pv_j = None if pv is None else jnp.asarray(pv[None])
            solo = generate(
                params, jnp.asarray(ids[None]), im_j, pv_j, cfg, sampling,
                cache_len=64,
            )[0]
            np.testing.assert_array_equal(got, solo)

    def test_budget_exhausts_mid_burst(self, setup, rng):
        """Staggered per-request budgets (3, 6, 9) against multi_step=4:
        slots freeze mid-burst at their own budget, not the burst boundary,
        and outputs stay exact."""
        cfg, params = setup
        sampling = SamplingConfig(max_new_tokens=6, temperature=0.0,
                                  eos_token_id=-1)
        batcher = PagedBatcher(
            params, cfg, max_slots=4, cache_len=64, page_size=16,
            sampling=sampling, num_pages=32, multi_step=4,
        )
        requests = [make_request(cfg, rng, T, with_image=False)
                    for T in (5, 8, 6)]
        handles = [
            batcher.submit(ids, im, pv, max_new_tokens=m)
            for (ids, im, pv), m in zip(requests, (3, 6, 9))
        ]
        batcher.run_until_drained()
        assert not batcher.active.any()
        for (ids, im, pv), h, m in zip(requests, handles, (3, 6, 9)):
            got = list(batcher.stream(h))
            assert len(got) == m
            solo = generate(
                params, jnp.asarray(ids[None]), None, None, cfg,
                SamplingConfig(max_new_tokens=m, temperature=0.0,
                               eos_token_id=-1),
                cache_len=64,
            )[0]
            np.testing.assert_array_equal(got, solo)
        # Everything released: no slot leaked pages past its budget freeze.
        assert batcher.allocator.available == 31

    def test_eos_mid_burst(self, setup, rng):
        """Pick the solo run's 3rd token as EOS: the burst must stop the
        stream exactly where single-stepping would (and match a solo
        generate under the same EOS)."""
        cfg, params = setup
        ids, im, pv = make_request(cfg, rng, 7, with_image=False)
        free_run = generate(
            params, jnp.asarray(ids[None]), None, None, cfg,
            SamplingConfig(max_new_tokens=8, temperature=0.0,
                           eos_token_id=-1),
            cache_len=64,
        )[0]
        eos = int(free_run[2])
        sampling = SamplingConfig(max_new_tokens=8, temperature=0.0,
                                  eos_token_id=eos)
        batcher = PagedBatcher(
            params, cfg, max_slots=2, cache_len=64, page_size=16,
            sampling=sampling, num_pages=32, multi_step=4,
        )
        h = batcher.submit(ids, im, pv)
        batcher.run_until_drained()
        # The batcher's stream excludes the EOS token itself: expect the
        # unconstrained run's prefix before its first EOS occurrence.
        first = next(i for i, t in enumerate(free_run) if int(t) == eos)
        np.testing.assert_array_equal(list(batcher.stream(h)),
                                      free_run[:first])
        assert not batcher.active.any()


class TestSlidingWindowServing:
    """cache_len beyond decoder.sliding_window: the paged decode must match
    the dense path (whose attention_mask applies the same window)."""

    def test_paged_decode_matches_dense_beyond_window(self, rng):
        import dataclasses

        base = tiny_config()
        cfg = dataclasses.replace(
            base, decoder=dataclasses.replace(base.decoder, sliding_window=16)
        )
        params = init_vis_zephyr(cfg, jax.random.PRNGKey(0))
        sampling = SamplingConfig(max_new_tokens=30, temperature=0.0, eos_token_id=-1)
        # cache_len 64 > window 16; prompt 24 already exceeds the window and
        # decode pushes length to ~54.
        batcher = PagedBatcher(
            params, cfg, max_slots=2, cache_len=64, page_size=16,
            sampling=sampling, num_pages=32,
        )
        ids, im, pv = make_request(cfg, rng, 24, with_image=False)
        h = batcher.submit(ids, im, pv)
        batcher.run_until_drained()
        solo = generate(
            params, jnp.asarray(ids[None]), None, None, cfg, sampling,
            cache_len=64,
        )[0]
        np.testing.assert_array_equal(list(batcher.stream(h)), solo)


class TestKitchenSink:
    """Every serving feature at once: paged pools + int8 KV + chunked
    prefill + speculation + draft model + sliding window + slot churn.
    The interaction surface is where bugs hide; output must still be
    token-exact vs solo generate."""

    def test_all_features_exact(self, rng):
        import dataclasses

        from vis_zephyr_tpu.serve.draft import DraftModel

        base = tiny_config()
        cfg = dataclasses.replace(
            base, decoder=dataclasses.replace(base.decoder, sliding_window=16)
        )
        params = init_vis_zephyr(cfg, jax.random.PRNGKey(0))
        sampling = SamplingConfig(max_new_tokens=12, temperature=0.0,
                                  eos_token_id=-1)
        draft = DraftModel(params, cfg, max_slots=3, cache_len=64)
        batcher = PagedBatcher(
            params, cfg, max_slots=3, cache_len=64, page_size=16,
            num_pages=14, sampling=sampling, kv_quant=True,
            prefill_chunk=16, lookahead=3, draft=draft, kv_fused=True,
        )
        # More requests than slots/pages hold at once → churn + requeue;
        # mixed text/multimodal; one copy-heavy prompt for real proposals.
        reqs = [
            make_request(cfg, rng, 6, with_image=False),
            make_request(cfg, rng, 9, with_image=True),
            (np.tile(rng.integers(5, 40, (5,)), 4), None, None),
            make_request(cfg, rng, 21, with_image=False),
            make_request(cfg, rng, 7, with_image=False),
        ]
        handles = [batcher.submit(ids, im, pv) for ids, im, pv in reqs]
        batcher.run_until_drained()
        for (ids, im, pv), h in zip(reqs, handles):
            got = list(batcher.stream(h))
            solo = generate(
                params, jnp.asarray(ids[None]),
                None if im is None else jnp.asarray(im[None]),
                None if pv is None else jnp.asarray(pv[None]),
                cfg, sampling, cache_len=64,
            )[0]
            np.testing.assert_array_equal(got, solo)
        assert not batcher.active.any()
        assert batcher.allocator.available == 13  # all pages released


class TestSpeculativePagedBatcher:
    """Prompt-lookup speculation on the PAGED batcher: per-slot proposals
    verified through the flash-structure kernel's multi-row shape
    (`_paged_verify_step`) — token-IDENTICAL to plain paged greedy, which
    is itself pinned to solo `generate`."""

    def _run(self, setup, requests, lookahead, max_new=16, metrics=None,
             **kw):
        cfg, params = setup
        sampling = SamplingConfig(max_new_tokens=max_new, temperature=0.0,
                                  eos_token_id=-1)
        batcher = PagedBatcher(
            params, cfg, max_slots=4, cache_len=64, page_size=16,
            num_pages=32, sampling=sampling, lookahead=lookahead,
            metrics=metrics, **kw,
        )
        handles = [batcher.submit(ids, im, pv) for ids, im, pv in requests]
        batcher.run_until_drained()
        return [list(batcher.stream(h)) for h in handles]

    def test_token_identical_to_plain_greedy(self, setup, rng):
        base = rng.integers(5, 60, (6,))
        reqs = [(np.concatenate([base] * rep), None, None) for rep in (3, 4)]
        reqs.append(make_request(tiny_config(), rng, 9, with_image=True))
        plain = self._run(setup, reqs, lookahead=0)
        spec = self._run(setup, reqs, lookahead=4)
        for p, s in zip(plain, spec):
            assert p == s and len(p) == 16

    def test_matches_standalone_generate(self, setup, rng):
        cfg, params = setup
        ids = np.tile(rng.integers(5, 40, (5,)), 4)
        sampling = SamplingConfig(max_new_tokens=12, temperature=0.0,
                                  eos_token_id=-1)
        got = self._run(setup, [(ids, None, None)], lookahead=6, max_new=12)[0]
        solo = generate(params, jnp.asarray(ids[None]), None, None,
                        cfg, sampling, cache_len=64)[0]
        np.testing.assert_array_equal(got, solo)

    def test_kv_quant_speculation(self, setup, rng):
        """int8 pools: verify rows are quantized on write and the multi-row
        kernel folds the scales — still exact vs plain int8-pool greedy."""
        ids = np.tile(rng.integers(5, 40, (6,)), 4)
        plain = self._run(setup, [(ids, None, None)], 0, kv_quant=True)
        spec = self._run(setup, [(ids, None, None)], 4, kv_quant=True)
        assert plain == spec and len(spec[0]) == 16

    def test_budget_edges_and_page_boundaries(self, setup, rng):
        """Verify spans crossing page boundaries (page_size 16, spans of 5)
        and budgets of 1/2 tokens must clamp exactly."""
        ids = np.tile(rng.integers(5, 40, (4,)), 5)
        for max_new in (1, 2, 17):
            plain = self._run(setup, [(ids, None, None)], 0, max_new=max_new)[0]
            spec = self._run(setup, [(ids, None, None)], 5, max_new=max_new)[0]
            assert plain == spec and len(spec) == max_new

    def test_windowed_speculation(self, rng):
        import dataclasses

        base = tiny_config()
        cfg = dataclasses.replace(
            base, decoder=dataclasses.replace(base.decoder, sliding_window=16)
        )
        params = init_vis_zephyr(cfg, jax.random.PRNGKey(0))
        sampling = SamplingConfig(max_new_tokens=30, temperature=0.0,
                                  eos_token_id=-1)
        ids = np.tile(rng.integers(5, 40, (6,)), 4)

        def run(lookahead):
            b = PagedBatcher(
                params, cfg, max_slots=2, cache_len=64, page_size=16,
                sampling=sampling, num_pages=32, lookahead=lookahead,
            )
            h = b.submit(ids, None, None)
            b.run_until_drained()
            return list(b.stream(h))

        assert run(0) == run(4)

    def test_acceptance_recorded_and_pages_released(self, setup, rng):
        from vis_zephyr_tpu.utils.metrics import ServingMetrics

        metrics = ServingMetrics()
        cfg, params = setup
        sampling = SamplingConfig(max_new_tokens=24, temperature=0.0,
                                  eos_token_id=-1)
        batcher = PagedBatcher(
            params, cfg, max_slots=2, cache_len=64, page_size=16,
            sampling=sampling, num_pages=16, lookahead=4, metrics=metrics,
        )
        ids = np.tile(rng.integers(5, 30, (4,)), 6)
        h = batcher.submit(ids, None, None)
        batcher.run_until_drained()
        assert len(list(batcher.stream(h))) == 24
        assert metrics.spec_proposed > 0
        assert batcher.allocator.available == 15  # all pages released
    """kv_quant=True: int8 pools + per-row scales through admission, decode
    writes, and the page walk. Token streams are compared EXACTLY against
    solo bf16 generate — on the tiny fixture model the per-row int8 error
    (≤ absmax/255) never flips a greedy argmax; a mismatch here means the
    quant plumbing is wrong, not that quantization is lossy."""

    def test_matches_standalone_generate(self, setup, rng):
        cfg, params = setup
        sampling = SamplingConfig(max_new_tokens=6, temperature=0.0, eos_token_id=-1)
        batcher = PagedBatcher(
            params, cfg, max_slots=4, cache_len=64, page_size=16,
            sampling=sampling, num_pages=32, kv_quant=True,
        )
        assert batcher.kp.dtype == jnp.int8
        kp = batcher.kp.shape
        assert batcher.ksp.shape == kp[:2] + (1, kp[2])
        requests = [make_request(cfg, rng, T, with_image=True) for T in (5, 8, 6)]
        handles = [batcher.submit(ids, im, pv) for ids, im, pv in requests]
        batcher.run_until_drained()
        for (ids, im, pv), handle in zip(requests, handles):
            got = list(batcher.stream(handle))
            solo = generate(
                params, jnp.asarray(ids[None]), jnp.asarray(im[None]),
                jnp.asarray(pv[None]), cfg, sampling, cache_len=64,
            )[0]
            np.testing.assert_array_equal(got, solo)

    def test_page_reuse_and_release(self, setup, rng):
        cfg, params = setup
        sampling = SamplingConfig(max_new_tokens=4, temperature=0.0, eos_token_id=-1)
        batcher = PagedBatcher(
            params, cfg, max_slots=2, cache_len=32, page_size=16,
            sampling=sampling, num_pages=5, kv_quant=True,
        )
        requests = [make_request(cfg, rng, 4 + i, with_image=False) for i in range(5)]
        handles = [batcher.submit(ids, im, pv) for ids, im, pv in requests]
        batcher.run_until_drained()
        for (ids, im, pv), h in zip(requests, handles):
            got = list(batcher.stream(h))
            solo = generate(
                params, jnp.asarray(ids[None]), None, None, cfg, sampling, cache_len=32
            )[0]
            np.testing.assert_array_equal(got, solo)
        assert batcher.allocator.available == 4

    def test_chunked_prefill_admission(self, setup, rng):
        """kv_quant composes with chunked prefill (the scratch cache is
        bf16; quantization happens once at install)."""
        cfg, params = setup
        sampling = SamplingConfig(max_new_tokens=5, temperature=0.0, eos_token_id=-1)
        batcher = PagedBatcher(
            params, cfg, max_slots=2, cache_len=64, page_size=16,
            sampling=sampling, num_pages=16, kv_quant=True, prefill_chunk=16,
        )
        ids, im, pv = make_request(cfg, rng, 21, with_image=False)
        h = batcher.submit(ids, im, pv)
        batcher.run_until_drained()
        solo = generate(
            params, jnp.asarray(ids[None]), None, None, cfg, sampling, cache_len=64
        )[0]
        np.testing.assert_array_equal(list(batcher.stream(h)), solo)

    def test_windowed_quant_decode(self, rng):
        import dataclasses

        base = tiny_config()
        cfg = dataclasses.replace(
            base, decoder=dataclasses.replace(base.decoder, sliding_window=16)
        )
        params = init_vis_zephyr(cfg, jax.random.PRNGKey(0))
        sampling = SamplingConfig(max_new_tokens=30, temperature=0.0, eos_token_id=-1)
        batcher = PagedBatcher(
            params, cfg, max_slots=2, cache_len=64, page_size=16,
            sampling=sampling, num_pages=32, kv_quant=True,
        )
        ids, im, pv = make_request(cfg, rng, 24, with_image=False)
        h = batcher.submit(ids, im, pv)
        batcher.run_until_drained()
        solo = generate(
            params, jnp.asarray(ids[None]), None, None, cfg, sampling,
            cache_len=64,
        )[0]
        np.testing.assert_array_equal(list(batcher.stream(h)), solo)


class TestCancellation:
    def test_cancel_frees_slot_and_pages(self, setup, rng):
        """Cancel mid-generation: the slot and its pages free at the next
        step, the stream ends with the sentinel, other slots are
        unaffected (token-exact vs solo)."""
        cfg, params = setup
        sampling = SamplingConfig(max_new_tokens=40, temperature=0.0,
                                  eos_token_id=-1)
        batcher = PagedBatcher(
            params, cfg, max_slots=2, cache_len=64, page_size=16,
            sampling=sampling, num_pages=16,
        )
        total = batcher.allocator.available
        victim = batcher.submit(*make_request(cfg, rng, 6, with_image=False))
        keeper = batcher.submit(*make_request(cfg, rng, 5, with_image=False),
                                max_new_tokens=8)
        # Run a few steps, then cancel the long request mid-flight.
        batcher._admit_pending()
        for _ in range(3):
            batcher.step()
        batcher.cancel(victim)
        batcher.run_until_drained()
        assert list(batcher.stream(victim))  # got SOME tokens, then closed
        got = list(batcher.stream(keeper))
        ids = keeper.input_ids
        solo = generate(
            params, jnp.asarray(ids[None]), None, None, cfg,
            SamplingConfig(max_new_tokens=8, temperature=0.0,
                           eos_token_id=-1), cache_len=64)[0]
        np.testing.assert_array_equal(got, solo)
        assert not batcher.active.any()
        assert batcher.allocator.available == total  # nothing leaked

    def test_closing_stream_cancels(self, setup, rng):
        """Abandoning the stream iterator (the HTTP disconnect path) frees
        the slot without an explicit cancel() call."""
        cfg, params = setup
        sampling = SamplingConfig(max_new_tokens=40, temperature=0.0,
                                  eos_token_id=-1)
        batcher = PagedBatcher(
            params, cfg, max_slots=2, cache_len=64, page_size=16,
            sampling=sampling, num_pages=16,
        )
        req = batcher.submit(*make_request(cfg, rng, 6, with_image=False))
        batcher._admit_pending()
        batcher.step()
        it = batcher.stream(req)
        next(it)
        it.close()  # client disconnect
        assert req.cancelled
        batcher.run_until_drained()
        assert not batcher.active.any()

    def test_cancel_while_pending(self, setup, rng):
        cfg, params = setup
        sampling = SamplingConfig(max_new_tokens=8, temperature=0.0,
                                  eos_token_id=-1)
        batcher = PagedBatcher(
            params, cfg, max_slots=1, cache_len=64, page_size=16,
            sampling=sampling, num_pages=16,
        )
        first = batcher.submit(*make_request(cfg, rng, 5, with_image=False))
        queued = batcher.submit(*make_request(cfg, rng, 5, with_image=False))
        batcher.cancel(queued)  # cancelled before ever admitted
        batcher.run_until_drained()
        assert list(batcher.stream(first))
        assert list(batcher.stream(queued)) == []
