"""Lazy page allocation + host-swap preemption (PagedBatcher lazy_alloc).

The invariant: outputs are token-identical to eager full-span allocation
on a big pool, no matter how much pool-pressure churn (swap-out /
swap-in) the tiny pool forces — the swap stores raw pool bytes, so the
round trip is bit-exact in every layout.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vis_zephyr_tpu.config import tiny_config
from vis_zephyr_tpu.models.vis_zephyr import init_vis_zephyr
from vis_zephyr_tpu.serve.generate import SamplingConfig
from vis_zephyr_tpu.serve.paged import PagedBatcher, _pool_rows_get
from vis_zephyr_tpu.utils.metrics import ServingMetrics


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_config()
    params = init_vis_zephyr(cfg, jax.random.PRNGKey(0))
    return cfg, params


def run_paged(params, cfg, requests, *, num_pages, lazy, max_new=40,
              metrics=None, **kw):
    sampling = SamplingConfig(max_new_tokens=max_new, temperature=0.0,
                              eos_token_id=-1)
    b = PagedBatcher(params, cfg, max_slots=4, cache_len=64, page_size=16,
                     num_pages=num_pages, sampling=sampling,
                     lazy_alloc=lazy, metrics=metrics, **kw)
    handles = [b.submit(np.asarray(ids), None, None) for ids in requests]
    b.run_until_drained()
    return [list(b.stream(h)) for h in handles]


# 4 slots x 40 new tokens from ~7-token prompts -> 3 pages each at peak
# (12 pages demanded) against an 8-usable-page pool: admission fits all
# four at 1-2 pages, growth then forces repeated preemption.
CONFIGS = [
    dict(),
    dict(kv_quant=True),
    dict(kv_quant=True, kv_fused=True),
    dict(multi_step=3),
    dict(lookahead=2),
    dict(prefill_chunk=16),
]


class TestLazyAllocExact:
    @pytest.mark.parametrize("extra", CONFIGS,
                             ids=["bf16", "quant", "quant_fused",
                                  "multistep", "lookahead", "chunked"])
    def test_churn_token_identical(self, setup, rng, extra):
        cfg, params = setup
        reqs = [rng.integers(5, 60, (n,)) for n in (7, 5, 9, 6)]
        plain = run_paged(params, cfg, reqs, num_pages=64, lazy=False,
                          **extra)
        metrics = ServingMetrics()
        lazy = run_paged(params, cfg, reqs, num_pages=9, lazy=True,
                         metrics=metrics, **extra)
        assert plain == lazy
        assert metrics.preempt_swap_out > 0
        assert metrics.preempt_swap_in > 0

    def test_more_requests_than_slots_under_churn(self, setup, rng):
        """Admission must NOT treat a swapped-out (inactive but owned)
        slot as free: with more requests than slots plus churn, every
        stream still completes and matches eager outputs."""
        cfg, params = setup
        reqs = [rng.integers(5, 60, (n,)) for n in (7, 5, 9, 6, 8, 5)]
        plain = run_paged(params, cfg, reqs, num_pages=64, lazy=False)
        metrics = ServingMetrics()
        lazy = run_paged(params, cfg, reqs, num_pages=9, lazy=True,
                         metrics=metrics)
        assert plain == lazy
        assert metrics.preempt_swap_out > 0

    def test_growth_at_cache_len_boundary(self, setup, rng):
        """slot_len + headroom past cache_len must clamp to the table
        row's width, not crash the scheduler (multi_step=3 headroom with
        prompt+max_new == cache_len)."""
        cfg, params = setup
        reqs = [rng.integers(5, 60, (8,))]
        plain = run_paged(params, cfg, reqs, num_pages=64, lazy=False,
                          max_new=56, multi_step=3)
        lazy = run_paged(params, cfg, reqs, num_pages=64, lazy=True,
                         max_new=56, multi_step=3)
        assert plain == lazy and len(lazy[0]) == 56

    def test_eager_small_pool_queues_instead(self, setup, rng):
        """Same tiny pool WITHOUT lazy_alloc: admission serializes on the
        full-span reservation but outputs still match (the control for
        the churn test: the pool size alone doesn't change tokens)."""
        cfg, params = setup
        reqs = [rng.integers(5, 60, (n,)) for n in (7, 5, 9, 6)]
        plain = run_paged(params, cfg, reqs, num_pages=64, lazy=False)
        small = run_paged(params, cfg, reqs, num_pages=9, lazy=False)
        assert plain == small


class TestSwapRoundTrip:
    @pytest.mark.parametrize("quant", [False, True], ids=["bf16", "int8"])
    def test_pool_rows_bit_exact(self, setup, rng, quant):
        """Direct swap-out/swap-in: the restored pool rows equal the
        originals bit-for-bit (raw bytes move, no dequant/requant)."""
        cfg, params = setup
        sampling = SamplingConfig(max_new_tokens=8, temperature=0.0,
                                  eos_token_id=-1)
        b = PagedBatcher(params, cfg, max_slots=2, cache_len=64,
                         page_size=16, num_pages=16, sampling=sampling,
                         kv_quant=quant, lazy_alloc=True)
        b.submit(np.asarray(rng.integers(5, 60, (20,))), None, None)
        b.step()  # admit + 1 decode step
        slot = int(np.nonzero(b.active)[0][0])
        pages0 = list(b.slot_pages[slot])
        idx0 = b._swap_idx(pages0)
        before = {n: np.asarray(_pool_rows_get(getattr(b, n), idx0))
                  for n in ("kp", "vp", "ksp", "vsp")
                  if getattr(b, n) is not None}
        b._swap_out(slot)
        assert not b.active[slot] and b.slot_pages[slot] == []
        b._try_swap_in()
        assert b.active[slot]
        pages1 = b.slot_pages[slot][: len(pages0)]
        idx1 = b._swap_idx(pages1)
        for name, ref in before.items():
            got = np.asarray(_pool_rows_get(getattr(b, name), idx1))
            np.testing.assert_array_equal(got, ref)
        # The slot keeps decoding correctly after the round trip.
        b.run_until_drained()

    def test_cancel_while_swapped(self, setup, rng):
        cfg, params = setup
        sampling = SamplingConfig(max_new_tokens=8, temperature=0.0,
                                  eos_token_id=-1)
        b = PagedBatcher(params, cfg, max_slots=2, cache_len=64,
                         page_size=16, num_pages=16, sampling=sampling,
                         lazy_alloc=True)
        h = b.submit(np.asarray(rng.integers(5, 60, (7,))), None, None)
        b.step()
        slot = int(np.nonzero(b.active)[0][0])
        b._swap_out(slot)
        b.slot_req[slot].cancelled = True
        b.step()  # _try_swap_in reaps it
        assert not b._swapped and not b.active.any()
        list(b.stream(h))  # stream terminates (finish put the sentinel)


class TestEngineValidation:
    def test_lazy_requires_paged_batching(self, setup):
        from conftest import MockTokenizer
        from vis_zephyr_tpu.serve.engine import ChatEngine

        cfg, params = setup
        with pytest.raises(ValueError, match="lazy_alloc"):
            ChatEngine(params, cfg, MockTokenizer(), lazy_alloc=True)
