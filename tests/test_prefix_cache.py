"""Automatic prefix caching: page sharing across requests with common
prompt prefixes (net-new vs the reference — `serve/paged.py::PrefixCache`).

Invariants pinned here:
- warm admission (prefix hit) is TOKEN-EXACT with cold admission for bf16
  pools (the warm path is `_chunk_extend` starting at a later chunk over
  the same scratch-cache shapes);
- shared pages are refcounted: nothing leaks, nothing double-frees, and a
  page shared by an active slot survives the donor's release;
- only positions before the first image sentinel are shared;
- eviction reclaims idle cached prefixes under pool pressure.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vis_zephyr_tpu.config import tiny_config
from vis_zephyr_tpu.constants import IMAGE_TOKEN_INDEX
from vis_zephyr_tpu.models.vis_zephyr import init_vis_zephyr
from vis_zephyr_tpu.serve.generate import SamplingConfig, generate
from vis_zephyr_tpu.serve.paged import PageAllocator, PagedBatcher, PrefixCache


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_config()
    params = init_vis_zephyr(cfg, jax.random.PRNGKey(0))
    return cfg, params


class TestRefcounts:
    def test_shared_page_survives_first_release(self):
        a = PageAllocator(8)
        pages = a.alloc(3)
        a.retain(pages[:2])           # second holder on two pages
        a.release(pages)              # first holder gone
        assert a.available == 8 - 1 - 2  # one page freed, two still held
        a.release(pages[:2])
        assert a.available == 7       # all back (page 0 reserved)

    def test_cache_lookup_insert_evict(self):
        a = PageAllocator(16)
        c = PrefixCache(a, page_size=4)
        ids = np.arange(100, 120, dtype=np.int32)
        pages = a.alloc(3)
        c.insert(ids, pages, 3)       # cache holds refs on 3 pages
        a.release(pages)              # owner gone; cache keeps them alive
        assert a.available == 15 - 3

        hit = c.lookup(ids, max_pages=5)
        assert hit == pages           # full 3-page chain
        part = c.lookup(np.concatenate([ids[:8], [999] * 12]), max_pages=5)
        assert part == pages[:2]      # diverges at chunk 2
        miss = c.lookup(np.asarray([7] * 20, np.int32), max_pages=5)
        assert miss == []
        a.release(hit)
        a.release(part)

        assert c.evict(2) == 2        # leaf-first
        assert c.lookup(ids, max_pages=5) == pages[:1]
        a.release(pages[:1])
        c.drop_all()
        assert a.available == 15

    def test_insert_dedups_existing_chain(self):
        a = PageAllocator(16)
        c = PrefixCache(a, page_size=4)
        ids = np.arange(50, 66, dtype=np.int32)
        first = a.alloc(2)
        c.insert(ids, first, 2)
        dup = a.alloc(2)
        c.insert(ids, dup, 2)         # chunks already cached → no new refs
        a.release(dup)                # duplicate pages free immediately
        assert a.available == 15 - 2 - 2 + 2


def _drain(batcher, reqs):
    handles = [batcher.submit(ids, im, pv) for ids, im, pv in reqs]
    batcher.run_until_drained()
    return [list(batcher.stream(h)) for h in handles]


def _make_batcher(params, cfg, sampling, **kw):
    kw.setdefault("max_slots", 3)
    kw.setdefault("cache_len", 96)
    kw.setdefault("page_size", 16)
    kw.setdefault("num_pages", 48)
    kw.setdefault("prefill_chunk", 16)
    return PagedBatcher(params, cfg, sampling=sampling, **kw)


class TestWarmAdmission:
    def test_warm_equals_cold_and_solo(self, setup, rng):
        """Same 40-token prefix across three prompts: the 2nd/3rd hit the
        cache (pages reused) yet decode token-identically to a cold
        batcher AND to solo generate."""
        cfg, params = setup
        sampling = SamplingConfig(max_new_tokens=6, temperature=0.0,
                                  eos_token_id=-1)
        prefix = rng.integers(5, cfg.decoder.vocab_size, (40,))
        reqs = [(np.concatenate([prefix,
                                 rng.integers(5, cfg.decoder.vocab_size,
                                              (t,))]), None, None)
                for t in (3, 7, 5)]
        warm = _make_batcher(params, cfg, sampling, prefix_cache=True)
        got = _drain(warm, reqs)
        assert warm.prefix_cache.hits >= 2
        assert warm.prefix_cache.pages_reused >= 4  # 2 hits × 2 pages

        cold = _make_batcher(params, cfg, sampling, prefix_cache=False)
        for a, b in zip(got, _drain(cold, reqs)):
            np.testing.assert_array_equal(a, b)
        for (ids, _, _), g in zip(reqs, got):
            solo = generate(params, jnp.asarray(ids[None]), None, None,
                            cfg, sampling, cache_len=96)[0]
            np.testing.assert_array_equal(g, solo)

    def test_exact_page_aligned_prefix(self, setup, rng):
        """A prompt that IS the cached prefix plus nothing page-aligned
        extra: at least one token must stay un-shared (its logits start
        decode) — exactness holds at the boundary."""
        cfg, params = setup
        sampling = SamplingConfig(max_new_tokens=5, temperature=0.0,
                                  eos_token_id=-1)
        prefix = rng.integers(5, cfg.decoder.vocab_size, (32,))  # 2 pages
        reqs = [(prefix.copy(), None, None), (prefix.copy(), None, None)]
        warm = _make_batcher(params, cfg, sampling, prefix_cache=True)
        got = _drain(warm, reqs)
        assert warm.prefix_cache.hits >= 1
        np.testing.assert_array_equal(got[0], got[1])
        solo = generate(params, jnp.asarray(prefix[None]), None, None,
                        cfg, sampling, cache_len=96)[0]
        np.testing.assert_array_equal(got[0], solo)

    def test_image_blocks_sharing_beyond_sentinel(self, setup, rng):
        """Two multimodal prompts share 32 text tokens before <image> but
        use DIFFERENT images: only pre-image pages may be shared, and each
        decodes exactly as its solo run."""
        cfg, params = setup
        H = cfg.vision.image_size
        sampling = SamplingConfig(max_new_tokens=5, temperature=0.0,
                                  eos_token_id=-1)
        text = rng.integers(5, cfg.decoder.vocab_size, (33,))
        reqs = []
        for _ in range(2):
            ids = np.concatenate([text, [IMAGE_TOKEN_INDEX],
                                  rng.integers(5, cfg.decoder.vocab_size, (4,))])
            im = rng.standard_normal((3, H, H, 3)).astype(np.float32)
            reqs.append((ids, im, np.ones((3,), bool)))
        warm = _make_batcher(params, cfg, sampling, prefix_cache=True)
        got = _drain(warm, reqs)
        assert warm.prefix_cache.hits >= 1
        # Shared pages cover ≤ 33 tokens → at most 2 pages of 16.
        assert warm.prefix_cache.pages_reused <= 2
        for (ids, im, pv), g in zip(reqs, got):
            solo = generate(params, jnp.asarray(ids[None]),
                            jnp.asarray(im[None]), jnp.asarray(pv[None]),
                            cfg, sampling, cache_len=96)[0]
            np.testing.assert_array_equal(g, solo)

    def test_multiturn_continuation_hits(self, setup, rng):
        """Turn 2's prompt extends turn 1's prompt (the chat pattern): the
        continuation reuses turn 1's pages."""
        cfg, params = setup
        sampling = SamplingConfig(max_new_tokens=4, temperature=0.0,
                                  eos_token_id=-1)
        turn1 = rng.integers(5, cfg.decoder.vocab_size, (35,))
        warm = _make_batcher(params, cfg, sampling, prefix_cache=True)
        (g1,) = _drain(warm, [(turn1, None, None)])
        turn2 = np.concatenate([turn1, g1,
                                rng.integers(5, cfg.decoder.vocab_size, (6,))])
        (g2,) = _drain(warm, [(turn2, None, None)])
        assert warm.prefix_cache.hits >= 1
        solo = generate(params, jnp.asarray(turn2[None]), None, None,
                        cfg, sampling, cache_len=96)[0]
        np.testing.assert_array_equal(g2, solo)

    @pytest.mark.parametrize("kw", [
        {"kv_fused": True},
        {"kv_quant": True, "kv_fused": True},
        {"lookahead": 3},
        {"multi_step": 3},
    ])
    def test_composes_with_serving_features(self, setup, rng, kw):
        """Prefix caching under fused pools / int8 KV / speculation /
        multi-step: outputs equal the same-feature cold batcher (quant
        included — warm re-reads the SAME int8 prefix rows the cold run
        wrote, and suffix drift would only appear vs *unquantized* runs)."""
        cfg, params = setup
        sampling = SamplingConfig(max_new_tokens=6, temperature=0.0,
                                  eos_token_id=-1)
        prefix = rng.integers(5, cfg.decoder.vocab_size, (32,))
        reqs = [(np.concatenate([prefix, rng.integers(5, 60, (t,))]),
                 None, None) for t in (4, 9)]
        warm = _make_batcher(params, cfg, sampling, prefix_cache=True, **kw)
        got = _drain(warm, reqs)
        cold = _make_batcher(params, cfg, sampling, prefix_cache=False, **kw)
        ref = _drain(cold, reqs)
        if "kv_quant" in kw:
            # Cold admits through unquantized scratch K/V; warm's suffix
            # conditions on the int8-roundtripped prefix — drift bounded by
            # the quantization class. Both runs must be deterministic.
            again = _make_batcher(params, cfg, sampling, prefix_cache=True,
                                  **kw)
            for a, b in zip(got, _drain(again, reqs)):
                np.testing.assert_array_equal(a, b)
        else:
            for a, b in zip(got, ref):
                np.testing.assert_array_equal(a, b)
        assert warm.prefix_cache.hits >= 1

    def test_no_leaks_after_churn_and_drop(self, setup, rng):
        """Pages: everything returns to the free list once slots finish and
        the cache is dropped; eviction reclaims under pressure."""
        cfg, params = setup
        sampling = SamplingConfig(max_new_tokens=3, temperature=0.0,
                                  eos_token_id=-1)
        warm = _make_batcher(params, cfg, sampling, prefix_cache=True,
                             num_pages=24, max_slots=2)
        total = warm.allocator.available
        for round_ in range(4):  # distinct prompts force insert+evict churn
            reqs = [(rng.integers(5, cfg.decoder.vocab_size, (20 + round_,)),
                     None, None) for _ in range(3)]
            _drain(warm, reqs)
        assert not warm.active.any()
        warm.prefix_cache.drop_all()
        assert warm.allocator.available == total


class TestWarmAdmissionTP:
    def test_warm_under_mesh_matches_cold(self, setup, rng):
        from vis_zephyr_tpu.parallel.mesh import create_mesh

        cfg, params = setup
        sampling = SamplingConfig(max_new_tokens=5, temperature=0.0,
                                  eos_token_id=-1)
        prefix = rng.integers(5, cfg.decoder.vocab_size, (32,))
        reqs = [(np.concatenate([prefix, rng.integers(5, 60, (t,))]),
                 None, None) for t in (3, 6)]
        mesh = create_mesh(model=2)
        warm = _make_batcher(params, cfg, sampling, prefix_cache=True,
                             mesh=mesh)
        got = _drain(warm, reqs)
        assert warm.prefix_cache.hits >= 1
        cold = _make_batcher(params, cfg, sampling, prefix_cache=False)
        for a, b in zip(got, _drain(cold, reqs)):
            np.testing.assert_array_equal(a, b)
