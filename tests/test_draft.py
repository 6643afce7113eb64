"""Draft-model speculative proposer (tiny models, CPU).

The invariant: with ANY draft (perfect, random, or declined), batcher
outputs are token-identical to plain greedy — the target's verify gates
everything; draft quality only moves the acceptance rate.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vis_zephyr_tpu.config import tiny_config
from vis_zephyr_tpu.models.vis_zephyr import init_vis_zephyr
from vis_zephyr_tpu.serve.batching import ContinuousBatcher
from vis_zephyr_tpu.serve.draft import DraftModel
from vis_zephyr_tpu.serve.generate import SamplingConfig


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_config()
    params = init_vis_zephyr(cfg, jax.random.PRNGKey(0))
    return cfg, params


def run_batcher(params, cfg, requests, lookahead=0, draft=None, max_new=16,
                metrics=None, paged=False):
    sampling = SamplingConfig(max_new_tokens=max_new, temperature=0.0,
                              eos_token_id=-1)
    if paged:
        from vis_zephyr_tpu.serve.paged import PagedBatcher

        b = PagedBatcher(params, cfg, max_slots=4, cache_len=64,
                         page_size=16, num_pages=32, sampling=sampling,
                         lookahead=lookahead, draft=draft, metrics=metrics)
    else:
        b = ContinuousBatcher(params, cfg, max_slots=4, cache_len=64,
                              sampling=sampling, lookahead=lookahead,
                              draft=draft, metrics=metrics)
    handles = [b.submit(np.asarray(ids), None, None) for ids in requests]
    b.run_until_drained()
    return [list(b.stream(h)) for h in handles]


class TestDraftProposer:
    def test_selfdraft_full_acceptance_token_identical(self, setup, rng):
        """Draft == target on text-only prompts: every proposal matches the
        target's greedy choice, so acceptance is 100% and the output is
        exactly plain greedy."""
        from vis_zephyr_tpu.utils.metrics import ServingMetrics

        cfg, params = setup
        reqs = [rng.integers(5, 60, (7,)), rng.integers(5, 60, (5,))]
        plain = run_batcher(params, cfg, reqs, lookahead=0)
        metrics = ServingMetrics()
        draft = DraftModel(params, cfg, max_slots=4, cache_len=64)
        spec = run_batcher(params, cfg, reqs, lookahead=4, draft=draft,
                           metrics=metrics)
        assert plain == spec
        assert metrics.spec_proposed > 0
        assert metrics.spec_accepted == metrics.spec_proposed

    def test_random_draft_still_exact(self, setup, rng):
        """A draft with DIFFERENT weights proposes mostly-wrong tokens; the
        verify still yields exactly plain greedy."""
        cfg, params = setup
        other = init_vis_zephyr(cfg, jax.random.PRNGKey(7))
        reqs = [rng.integers(5, 60, (6,))]
        plain = run_batcher(params, cfg, reqs, lookahead=0, max_new=12)
        draft = DraftModel(other, cfg, max_slots=4, cache_len=64)
        spec = run_batcher(params, cfg, reqs, lookahead=3, draft=draft,
                           max_new=12)
        assert plain == spec

    def test_paged_batcher_with_draft(self, setup, rng):
        cfg, params = setup
        reqs = [rng.integers(5, 60, (7,)), rng.integers(5, 60, (9,))]
        plain = run_batcher(params, cfg, reqs, lookahead=0, paged=True)
        draft = DraftModel(params, cfg, max_slots=4, cache_len=64)
        spec = run_batcher(params, cfg, reqs, lookahead=4, draft=draft,
                           paged=True)
        assert plain == spec

    def test_declined_slot_falls_back_to_lookup(self, setup, rng):
        """History longer than the draft's cache: the slot is declined and
        prompt-lookup still drives proposals — outputs stay exact."""
        cfg, params = setup
        ids = np.tile(rng.integers(5, 40, (5,)), 4)  # copy-heavy, len 20
        plain = run_batcher(params, cfg, [ids], lookahead=0)
        draft = DraftModel(params, cfg, max_slots=4, cache_len=16)  # too small
        spec = run_batcher(params, cfg, [ids], lookahead=4, draft=draft)
        assert plain == spec
        assert (draft.len == 0).all()  # never drafted

    def test_tight_cache_caps_span_instead_of_declining(self, setup, rng):
        """A slot whose draft cache can't hold the FULL lookahead span
        drafts a SHORTER span (rows = len + allowed + 2 == cache_len)
        rather than being declined and permanently zeroed."""
        cfg, params = setup
        hist = list(rng.integers(5, 60, (7,)))  # admit stores 6 rows
        draft = DraftModel(params, cfg, max_slots=4, cache_len=12)
        assert draft.admit(0, hist)
        assert draft.len[0] == 6
        active = np.array([True, False, False, False])
        pending = np.array([hist[-1], 0, 0, 0], np.int32)
        caps = np.array([8, 0, 0, 0])
        props = draft.propose(active, pending, caps, span=8)
        assert props[0] is not None and len(props[0]) == 4  # 12 - 6 - 2
        assert all(p is None for p in props[1:])
        assert draft._drafted[0]
        draft.commit(0, 5)  # pending + 4 accepted
        assert draft.len[0] == 11  # still drafting-capable mirror
        # Next round: no headroom left (12 - 11 - 2 < 0) -> not drafting.
        props = draft.propose(active, pending, caps, span=8)
        assert props[0] is None and not draft._drafted[0]

    def test_tight_draft_cache_still_exact(self, setup, rng):
        """End-to-end with a draft cache too small for the full span:
        outputs stay token-identical to plain greedy while early rounds
        use capped draft spans."""
        cfg, params = setup
        ids = rng.integers(5, 60, (7,))
        plain = run_batcher(params, cfg, [ids], lookahead=0, max_new=12)
        draft = DraftModel(params, cfg, max_slots=4, cache_len=12)
        spec = run_batcher(params, cfg, [ids], lookahead=8, draft=draft,
                           max_new=12)
        assert plain == spec

    def test_budget_edges(self, setup, rng):
        cfg, params = setup
        ids = rng.integers(5, 60, (6,))
        draft = DraftModel(params, cfg, max_slots=4, cache_len=64)
        for max_new in (1, 2, 3):
            plain = run_batcher(params, cfg, [ids], lookahead=0,
                                max_new=max_new)
            draft2 = DraftModel(params, cfg, max_slots=4, cache_len=64)
            spec = run_batcher(params, cfg, [ids], lookahead=5, draft=draft2,
                               max_new=max_new)
            assert plain == spec and len(spec[0]) == max_new

    def test_interleaved_admissions(self, setup, rng):
        """Slots admitted mid-flight get drafted from their own admission
        point; earlier slots' draft state is unaffected."""
        cfg, params = setup
        sampling = SamplingConfig(max_new_tokens=10, temperature=0.0,
                                  eos_token_id=-1)
        r1 = rng.integers(5, 60, (5,))
        r2 = rng.integers(5, 60, (7,))
        draft = DraftModel(params, cfg, max_slots=4, cache_len=64)
        b = ContinuousBatcher(params, cfg, max_slots=4, cache_len=64,
                              sampling=sampling, lookahead=3, draft=draft)
        h1 = b.submit(np.asarray(r1), None, None)
        b.step()
        h2 = b.submit(np.asarray(r2), None, None)
        b.run_until_drained()
        got = [list(b.stream(h1)), list(b.stream(h2))]
        plain = run_batcher(params, cfg, [r1, r2], lookahead=0, max_new=10)
        assert got == plain
