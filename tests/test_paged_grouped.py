"""Slot-grouped folded decode kernel (`slot_block`/SB > 1) tests.

The grouped kernel (`_fa_gmh_kernel`) batches SB slots per grid cell —
one program walks the group's blocks, one [SB·Hkv, SG, bk] dot pair per
block — to divide the per-program/per-block fixed cost that dominates
the folded kernel at serving batch sizes. Every result here is pinned
allclose to the SB=1 kernel and the XLA oracle (interpret mode); the
SB=1 path is itself oracle-tested in tests/test_paged_attention.py and
tests/test_paged_fused.py.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from vis_zephyr_tpu.ops.paged_attention import (
    paged_attention_fa,
    paged_attention_reference,
    quantize_kv_pool,
)

from test_paged_fused import fuse_pools, fuse_scales, make_case


@pytest.fixture
def rng():
    return np.random.default_rng(7)


@pytest.mark.parametrize("sb", [2, 4])
class TestGroupedKernel:
    def test_matches_oracle_and_sb1(self, rng, sb):
        # B=5 with SB=2/4 exercises the empty-slot padding path too.
        q, kp, vp, table, lengths = make_case(rng, B=5)
        ref = paged_attention_reference(q, kp, vp, table, lengths)
        q4 = q[:, None]
        base = paged_attention_fa(q4, kp, vp, table, lengths, lengths - 1,
                                  slot_block=1)
        got = paged_attention_fa(q4, kp, vp, table, lengths, lengths - 1,
                                 slot_block=sb)
        np.testing.assert_allclose(got[:, 0], ref, rtol=2e-2, atol=2e-2)
        np.testing.assert_allclose(np.asarray(got), np.asarray(base),
                                   rtol=1e-5, atol=1e-5)

    def test_selfterm_fused_quant(self, rng, sb):
        q, kp, vp, table, lengths = make_case(rng, B=6, Hkv=2, Hq=8)
        Hkv, _, ps, D = kp.shape
        B = q.shape[0]
        k_new = jnp.asarray(rng.standard_normal((B, Hkv, D)), jnp.float32)
        v_new = jnp.asarray(rng.standard_normal((B, Hkv, D)), jnp.float32)
        kq, ks = quantize_kv_pool(kp)
        vq, vs = quantize_kv_pool(vp)
        kvq, kvs = fuse_pools(kq, vq), fuse_scales(ks, vs)
        ref = paged_attention_reference(
            q, jnp.asarray(np.asarray(kq), jnp.float32) * 0 + kp, vp,
            table, lengths)  # oracle on unquantized pools, loose tol below
        q4 = q[:, None]
        base = paged_attention_fa(
            q4, kvq, None, table, lengths, lengths,
            k_scales=kvs, k_new=k_new, v_new=v_new, slot_block=1)
        got = paged_attention_fa(
            q4, kvq, None, table, lengths, lengths,
            k_scales=kvs, k_new=k_new, v_new=v_new, slot_block=sb)
        np.testing.assert_allclose(np.asarray(got), np.asarray(base),
                                   rtol=1e-5, atol=1e-5)
        assert np.all(np.isfinite(np.asarray(got)))
        del ref

    def test_windowed(self, rng, sb):
        q, kp, vp, table, lengths = make_case(rng, B=4)
        ref = paged_attention_reference(q, kp, vp, table, lengths,
                                        sliding_window=24)
        got = paged_attention_fa(q[:, None], kp, vp, table, lengths,
                                 lengths - 1, sliding_window=24,
                                 slot_block=sb)
        np.testing.assert_allclose(got[:, 0], ref, rtol=2e-2, atol=2e-2)

    def test_skewed_lengths(self, rng, sb):
        # Strongly skewed group members: one near-full slot beside
        # near-empty ones — exercises the clamped 1-page fetch for slots
        # past their own walk range.
        q, kp, vp, table, lengths = make_case(rng, B=4)
        lengths = jnp.asarray([64, 1, 2, 63], jnp.int32)
        ref = paged_attention_reference(q, kp, vp, table, lengths)
        got = paged_attention_fa(q[:, None], kp, vp, table, lengths,
                                 lengths - 1, slot_block=sb)
        np.testing.assert_allclose(got[:, 0], ref, rtol=2e-2, atol=2e-2)

    def test_multi_row_verify_shape(self, rng, sb):
        # S=3 speculative-verify rows.
        q, kp, vp, table, lengths = make_case(rng, B=4)
        S, B, Hq, D = 3, q.shape[0], q.shape[1], q.shape[2]
        qs = jnp.asarray(rng.standard_normal((B, S, Hq, D)), jnp.float32)
        lengths = jnp.maximum(lengths, S)
        q_offs = lengths - S
        base = paged_attention_fa(qs, kp, vp, table, lengths, q_offs,
                                  slot_block=1)
        got = paged_attention_fa(qs, kp, vp, table, lengths, q_offs,
                                 slot_block=sb)
        np.testing.assert_allclose(np.asarray(got), np.asarray(base),
                                   rtol=1e-5, atol=1e-5)
