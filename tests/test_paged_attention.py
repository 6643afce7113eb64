"""Paged-attention decode kernel vs a dense-gather oracle (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vis_zephyr_tpu.ops.paged_attention import paged_attention, paged_attention_reference


def make_case(rng, B=3, Hq=8, Hkv=2, D=64, page_size=16, pages_per_seq=4, num_pages=32):
    lengths = np.asarray([rng.integers(1, pages_per_seq * page_size + 1) for _ in range(B)])
    # Unique random page assignment per sequence slot.
    table = rng.permutation(num_pages)[: B * pages_per_seq].reshape(B, pages_per_seq)
    q = rng.standard_normal((B, Hq, D)).astype(np.float32)
    # Head-major pool layout [Hkv, num_pages, page_size, D].
    k_pages = rng.standard_normal((Hkv, num_pages, page_size, D)).astype(np.float32)
    v_pages = rng.standard_normal((Hkv, num_pages, page_size, D)).astype(np.float32)
    return (
        jnp.asarray(q), jnp.asarray(k_pages), jnp.asarray(v_pages),
        jnp.asarray(table, jnp.int32), jnp.asarray(lengths, jnp.int32),
    )


class TestPagedAttention:
    def test_matches_dense_oracle(self, rng):
        q, kp, vp, table, lengths = make_case(rng)
        got = paged_attention(q, kp, vp, table, lengths)
        ref = paged_attention_reference(q, kp, vp, table, lengths)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)

    def test_short_sequences_skip_pages(self, rng):
        # length=1: only the first slot of the first page attends.
        q, kp, vp, table, _ = make_case(rng, B=2)
        lengths = jnp.asarray([1, 5], jnp.int32)
        got = paged_attention(q, kp, vp, table, lengths)
        ref = paged_attention_reference(q, kp, vp, table, lengths)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)

    def test_page_table_indirection_matters(self, rng):
        """Shuffling the page table must change outputs accordingly."""
        q, kp, vp, table, lengths = make_case(rng, B=1, pages_per_seq=3)
        got = paged_attention(q, kp, vp, table, lengths)
        shuffled = table[:, ::-1]
        got2 = paged_attention(q, kp, vp, shuffled, lengths)
        ref2 = paged_attention_reference(q, kp, vp, shuffled, lengths)
        np.testing.assert_allclose(np.asarray(got2), np.asarray(ref2), rtol=2e-5, atol=2e-5)
        assert not np.allclose(np.asarray(got), np.asarray(got2))

    def test_mqa_and_gqa_groupings(self, rng):
        for Hq, Hkv in ((4, 4), (8, 1)):
            q, kp, vp, table, lengths = make_case(rng, Hq=Hq, Hkv=Hkv)
            got = paged_attention(q, kp, vp, table, lengths)
            ref = paged_attention_reference(q, kp, vp, table, lengths)
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5
            )


class TestSelfTerm:
    def test_new_token_operands_match_oracle(self, rng):
        """The current token's K/V as kernel operands == appending it to the
        cache (exact online-softmax epilogue)."""
        for Hq, Hkv in ((8, 2), (4, 4), (8, 1)):
            q, kp, vp, table, lengths = make_case(rng, Hq=Hq, Hkv=Hkv)
            B, _, D = q.shape
            k_new = jnp.asarray(rng.standard_normal((B, Hkv, D)), jnp.float32)
            v_new = jnp.asarray(rng.standard_normal((B, Hkv, D)), jnp.float32)
            got = paged_attention(q, kp, vp, table, lengths, k_new=k_new, v_new=v_new)
            ref = paged_attention_reference(q, kp, vp, table, lengths, k_new, v_new)
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5
            )

    def test_zero_length_row_attends_self_only(self, rng):
        q, kp, vp, table, _ = make_case(rng, B=2)
        B, Hq, D = q.shape
        Hkv = kp.shape[0]
        lengths = jnp.asarray([0, 3], jnp.int32)
        k_new = jnp.asarray(rng.standard_normal((B, Hkv, D)), jnp.float32)
        v_new = jnp.asarray(rng.standard_normal((B, Hkv, D)), jnp.float32)
        got = paged_attention(q, kp, vp, table, lengths, k_new=k_new, v_new=v_new)
        # Row 0 has no cache: softmax over {self} → exactly v_new per group.
        expect0 = np.repeat(np.asarray(v_new[0]), Hq // Hkv, axis=0)
        np.testing.assert_allclose(np.asarray(got[0]), expect0, rtol=2e-5, atol=2e-5)


class TestPagedKVUpdate:
    """In-place Pallas pool write (`paged_kv_update`) == XLA scatter.

    Page ids are unique per call in production (each (layer, slot) owns a
    distinct pool page; only the reserved trash page repeats) — duplicates
    have undefined scatter order, so tests use unique ids."""

    def test_matches_xla_scatter(self, rng):
        from vis_zephyr_tpu.ops.paged_attention import paged_kv_update

        Hkv, N, ps, D, L, B = 2, 16, 8, 128, 3, 4
        kp = jnp.asarray(rng.standard_normal((Hkv, N, ps, D)), jnp.float32)
        vp = jnp.asarray(rng.standard_normal((Hkv, N, ps, D)), jnp.float32)
        ks = jnp.asarray(rng.standard_normal((L, B, Hkv, D)), jnp.float32)
        vs = jnp.asarray(rng.standard_normal((L, B, Hkv, D)), jnp.float32)
        pids = jnp.asarray(rng.permutation(N)[: L * B].reshape(L, B), jnp.int32)
        offs = jnp.asarray(rng.integers(0, ps, (B,)), jnp.int32)

        ref_k = kp.at[:, pids, jnp.broadcast_to(offs, (L, B))].set(
            jnp.moveaxis(ks, 2, 0))
        ref_v = vp.at[:, pids, jnp.broadcast_to(offs, (L, B))].set(
            jnp.moveaxis(vs, 2, 0))
        got_k, got_v = paged_kv_update(kp, vp, ks, vs, pids, offs)
        np.testing.assert_array_equal(np.asarray(got_k), np.asarray(ref_k))
        np.testing.assert_array_equal(np.asarray(got_v), np.asarray(ref_v))

    def test_untouched_pages_preserved(self, rng):
        from vis_zephyr_tpu.ops.paged_attention import paged_kv_update

        Hkv, N, ps, D, L, B = 2, 8, 8, 128, 1, 2
        kp = jnp.asarray(rng.standard_normal((Hkv, N, ps, D)), jnp.float32)
        vp = jnp.asarray(rng.standard_normal((Hkv, N, ps, D)), jnp.float32)
        ks = jnp.zeros((L, B, Hkv, D), jnp.float32)
        vs = jnp.zeros((L, B, Hkv, D), jnp.float32)
        pids = jnp.asarray([[1, 2]], jnp.int32)
        offs = jnp.asarray([0, 3], jnp.int32)
        kp_host = np.asarray(kp)  # the pools are donated (deleted) below
        got_k, _ = paged_kv_update(kp, vp, ks, vs, pids, offs)
        # Pages 0 and 3.. untouched; page 1 row 0 and page 2 row 3 zeroed.
        np.testing.assert_array_equal(np.asarray(got_k[:, 0]), kp_host[:, 0])
        np.testing.assert_array_equal(np.asarray(got_k[:, 3:]), kp_host[:, 3:])
        assert float(jnp.abs(got_k[:, 1, 0]).max()) == 0.0
        assert float(jnp.abs(got_k[:, 2, 3]).max()) == 0.0
        np.testing.assert_array_equal(np.asarray(got_k[:, 1, 1:]), kp_host[:, 1, 1:])


class TestSlidingWindow:
    """VERDICT r2 #8: windowed page walk (backbone semantics — Mistral
    window 4096 under max_position 32768; mask rule matches
    `ops.attention.attention_mask`: q_pos − kv_pos < window)."""

    def test_matches_windowed_oracle(self, rng):
        q, kp, vp, table, _ = make_case(rng, B=3, pages_per_seq=6)
        lengths = jnp.asarray([96, 17, 5], jnp.int32)
        for w in (8, 16, 40, 64):
            got = paged_attention(q, kp, vp, table, lengths, sliding_window=w)
            ref = paged_attention_reference(q, kp, vp, table, lengths,
                                            sliding_window=w)
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5,
                err_msg=f"window={w}")

    def test_window_changes_output_when_binding(self, rng):
        q, kp, vp, table, _ = make_case(rng, B=1, pages_per_seq=6)
        lengths = jnp.asarray([90], jnp.int32)
        full = paged_attention(q, kp, vp, table, lengths)
        windowed = paged_attention(q, kp, vp, table, lengths, sliding_window=16)
        assert not np.allclose(np.asarray(full), np.asarray(windowed))
        # A window wider than the sequence is a no-op.
        wide = paged_attention(q, kp, vp, table, lengths, sliding_window=256)
        np.testing.assert_allclose(np.asarray(full), np.asarray(wide),
                                   rtol=2e-5, atol=2e-5)

    def test_window_with_self_term(self, rng):
        """k_new variant: the query sits at position `length` and its
        self-term is always in-window."""
        q, kp, vp, table, _ = make_case(rng, B=2, pages_per_seq=4)
        lengths = jnp.asarray([40, 3], jnp.int32)
        Hkv, D = kp.shape[0], kp.shape[-1]
        k_new = jnp.asarray(rng.standard_normal((2, Hkv, D)), jnp.float32)
        v_new = jnp.asarray(rng.standard_normal((2, Hkv, D)), jnp.float32)
        for w in (8, 33):
            got = paged_attention(q, kp, vp, table, lengths,
                                  k_new=k_new, v_new=v_new, sliding_window=w)
            ref = paged_attention_reference(q, kp, vp, table, lengths,
                                            k_new=k_new, v_new=v_new,
                                            sliding_window=w)
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5,
                err_msg=f"window={w}")


class TestQuantizedKV:
    """int8 KV pools (kv_quant serving mode): per-row absmax scales, library
    convention row ≈ int8·scale/127.5 (`ops.paged_attention.quantize_kv`)."""

    def test_quant_roundtrip_error_bounded(self, rng):
        from vis_zephyr_tpu.ops.paged_attention import dequant_kv, quantize_kv

        x = jnp.asarray(rng.standard_normal((4, 16, 64)), jnp.float32)
        q, s = quantize_kv(x)
        assert s.shape == x.shape[:-1] + (1,)
        back = dequant_kv(q, s, jnp.float32)
        # Per-row absmax int8: max error ≤ absmax/127.5/2 per element.
        bound = np.asarray(s) / 127.5 / 2 + 1e-6
        assert (np.abs(np.asarray(back) - np.asarray(x)) <= bound).all()

    def test_quantized_attention_matches_dequant_oracle(self, rng):
        """paged_attention with k_scales == the oracle over explicitly
        dequantized pools (same dequant math → tight tolerance)."""
        from vis_zephyr_tpu.ops.paged_attention import (
            dequant_kv_pool, quantize_kv_pool,
        )

        q, kp, vp, table, lengths = make_case(rng)
        kq, ks = quantize_kv_pool(kp)
        vq, vs = quantize_kv_pool(vp)
        assert ks.shape == kp.shape[:2] + (1, kp.shape[2])
        got = paged_attention(q, kq, vq, table, lengths, k_scales=ks, v_scales=vs)
        ref = paged_attention_reference(
            q, dequant_kv_pool(kq, ks, jnp.float32),
            dequant_kv_pool(vq, vs, jnp.float32), table, lengths,
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-3, atol=2e-3)

    def test_quantized_attention_close_to_float(self, rng):
        """Quantization error through attention stays small (the mode is a
        throughput trade, not an accuracy cliff)."""
        from vis_zephyr_tpu.ops.paged_attention import quantize_kv_pool

        q, kp, vp, table, lengths = make_case(rng)
        kq, ks = quantize_kv_pool(kp)
        vq, vs = quantize_kv_pool(vp)
        got = paged_attention(q, kq, vq, table, lengths, k_scales=ks, v_scales=vs)
        ref = paged_attention_reference(q, kp, vp, table, lengths)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=0.1, atol=0.05)

    def test_windowed_quantized_attention(self, rng):
        from vis_zephyr_tpu.ops.paged_attention import (
            dequant_kv_pool, quantize_kv_pool,
        )

        q, kp, vp, table, _ = make_case(rng, B=2, pages_per_seq=4)
        lengths = jnp.asarray([55, 9], jnp.int32)
        kq, ks = quantize_kv_pool(kp)
        vq, vs = quantize_kv_pool(vp)
        got = paged_attention(q, kq, vq, table, lengths, sliding_window=16,
                              k_scales=ks, v_scales=vs)
        ref = paged_attention_reference(
            q, dequant_kv_pool(kq, ks, jnp.float32),
            dequant_kv_pool(vq, vs, jnp.float32), table, lengths,
            sliding_window=16,
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-3, atol=2e-3)


def fa_reference(q, k_pages, v_pages, table, lengths, q_offs,
                 sliding_window=None):
    """Dense-gather oracle for the flash-structure kernel's multi-row shape:
    q [B, S, Hq, D], row j at position q_offs[b]+j, attending pool slots
    [max(0, pos−window+1), min(pos, length−1)]."""
    from vis_zephyr_tpu.ops.attention import attention_mask, dot_product_attention

    B, S, Hq, D = q.shape
    Hkv, _, page_size, _ = k_pages.shape
    T = table.shape[1] * page_size
    k = jnp.moveaxis(k_pages[:, table], 0, 3).reshape(B, T, Hkv, D)
    v = jnp.moveaxis(v_pages[:, table], 0, 3).reshape(B, T, Hkv, D)
    kv_valid = jnp.arange(T)[None, :] < lengths[:, None]
    q_pos = q_offs[:, None] + jnp.arange(S)[None, :]
    kv_pos = jnp.broadcast_to(jnp.arange(T), (B, T))
    mask = attention_mask(q_pos, kv_pos, kv_valid=kv_valid, causal=True,
                          sliding_window=sliding_window)
    return dot_product_attention(q, k, v, mask=mask)


@pytest.mark.parametrize("fold", [False, True], ids=["grid-bh", "grid-b"])
class TestFlashStructureKernel:
    """`paged_attention_fa`: the HBM-resident double-buffered kernel — S>1
    verify rows, explicit q_offs, loop-bound sliding windows, int8 pools.
    Both grids covered: per-(slot, head) cells and folded per-slot cells."""

    def test_single_row_matches_dispatch_path(self, rng, fold):
        from vis_zephyr_tpu.ops.paged_attention import paged_attention_fa

        q, kp, vp, table, lengths = make_case(rng)
        got = paged_attention_fa(q[:, None], kp, vp, table, lengths,
                                 lengths - 1, fold_heads=fold)[:, 0]
        ref = paged_attention_reference(q, kp, vp, table, lengths)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)

    def test_multi_row_verify_shape(self, rng, fold):
        """S=3 speculative-verify rows: row j attends through position
        q_offs+j, including the candidate rows written just before it."""
        from vis_zephyr_tpu.ops.paged_attention import paged_attention_fa

        S = 3
        for Hq, Hkv in ((8, 2), (4, 4), (8, 1)):
            q1, kp, vp, table, lengths = make_case(rng, Hq=Hq, Hkv=Hkv)
            B, _, D = q1.shape
            lengths = jnp.maximum(lengths, S)  # pools hold the S rows
            q = jnp.asarray(rng.standard_normal((B, S, Hq, D)), jnp.float32)
            q_offs = lengths - S
            got = paged_attention_fa(q, kp, vp, table, lengths, q_offs,
                                     fold_heads=fold)
            ref = fa_reference(q, kp, vp, table, lengths, q_offs)
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5,
                err_msg=f"Hq={Hq} Hkv={Hkv}")

    def test_multi_row_rows_differ(self, rng, fold):
        """Causality binds: row 0 (earlier position) != row S−1."""
        from vis_zephyr_tpu.ops.paged_attention import paged_attention_fa

        q1, kp, vp, table, _ = make_case(rng, B=1)
        B, Hq, D = q1.shape
        lengths = jnp.asarray([40], jnp.int32)
        q = jnp.broadcast_to(q1[:, None], (B, 2, Hq, D))  # same query twice
        got = paged_attention_fa(q, kp, vp, table, lengths, lengths - 2,
                                 fold_heads=fold)
        assert not np.allclose(np.asarray(got[:, 0]), np.asarray(got[:, 1]))

    def test_windowed_multi_row(self, rng, fold):
        from vis_zephyr_tpu.ops.paged_attention import paged_attention_fa

        S = 2
        q1, kp, vp, table, _ = make_case(rng, B=2, pages_per_seq=6)
        B, Hq, D = q1.shape
        lengths = jnp.asarray([96, 7], jnp.int32)
        q = jnp.asarray(rng.standard_normal((B, S, Hq, D)), jnp.float32)
        q_offs = lengths - S
        for w in (8, 16, 40):
            got = paged_attention_fa(q, kp, vp, table, lengths, q_offs,
                                     sliding_window=w, fold_heads=fold)
            ref = fa_reference(q, kp, vp, table, lengths, q_offs,
                               sliding_window=w)
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5,
                err_msg=f"window={w}")

    def test_quantized_multi_row(self, rng, fold):
        from vis_zephyr_tpu.ops.paged_attention import (
            dequant_kv_pool, paged_attention_fa, quantize_kv_pool,
        )

        S = 2
        q1, kp, vp, table, lengths = make_case(rng)
        B, Hq, D = q1.shape
        lengths = jnp.maximum(lengths, S)
        q = jnp.asarray(rng.standard_normal((B, S, Hq, D)), jnp.float32)
        q_offs = lengths - S
        kq, ks = quantize_kv_pool(kp)
        vq, vs = quantize_kv_pool(vp)
        got = paged_attention_fa(q, kq, vq, table, lengths, q_offs,
                                 k_scales=ks, v_scales=vs, fold_heads=fold)
        ref = fa_reference(q, dequant_kv_pool(kq, ks, jnp.float32),
                           dequant_kv_pool(vq, vs, jnp.float32),
                           table, lengths, q_offs)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-3, atol=2e-3)

    def test_block_size_overshoot_clamps(self, rng, fold):
        """ppcb need not divide pages_per_seq: overshoot DMAs clamp to the
        row's last entry and their slots are masked."""
        from vis_zephyr_tpu.ops.paged_attention import paged_attention_fa

        q, kp, vp, table, lengths = make_case(rng, pages_per_seq=6)
        ref = paged_attention_reference(q, kp, vp, table, lengths)
        for ppcb in (1, 2, 4, 6):
            got = paged_attention_fa(q[:, None], kp, vp, table, lengths,
                                     lengths - 1, pages_per_block=ppcb,
                                     fold_heads=fold)[:, 0]
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5,
                err_msg=f"ppcb={ppcb}")

    def test_empty_tail_slot(self, rng, fold):
        """A zero-length slot (empty block range) must not corrupt its
        neighbours' cross-cell prefetch chain, and its own output rows are
        all-masked (l=0 → zeros)."""
        from vis_zephyr_tpu.ops.paged_attention import paged_attention_fa

        q, kp, vp, table, _ = make_case(rng, B=3)
        lengths = jnp.asarray([9, 0, 23], jnp.int32)
        got = paged_attention_fa(q[:, None], kp, vp, table, lengths,
                                 jnp.maximum(lengths - 1, 0),
                                 fold_heads=fold)[:, 0]
        ref = paged_attention_reference(
            q, kp, vp, table, jnp.asarray([9, 1, 23], jnp.int32))
        np.testing.assert_allclose(np.asarray(got[0]), np.asarray(ref[0]),
                                   rtol=2e-5, atol=2e-5)
        np.testing.assert_allclose(np.asarray(got[2]), np.asarray(ref[2]),
                                   rtol=2e-5, atol=2e-5)
        assert float(jnp.abs(got[1]).max()) == 0.0


class TestRunFastPath:
    """Contiguous-run table rows take the folded kernel's single-DMA fast
    path; scattered rows take per-page copies. Same logical cache → same
    output."""

    def test_run_equals_scatter(self, rng):
        from vis_zephyr_tpu.ops.paged_attention import paged_attention_fa

        B, Hq, Hkv, D, ps, pps = 3, 8, 2, 64, 16, 4
        num_pages = 1 + B * pps
        q = jnp.asarray(rng.standard_normal((B, 1, Hq, D)), jnp.float32)
        lengths = jnp.asarray([ps * pps, 19, 37], jnp.int32)

        # Contiguous layout: slot b owns run [1 + b*pps, 1 + (b+1)*pps).
        run_table = np.zeros((B, pps), np.int32)
        for b in range(B):
            run_table[b] = 1 + b * pps + np.arange(pps)
        kp_run = rng.standard_normal((Hkv, num_pages, ps, D)).astype(np.float32)
        vp_run = rng.standard_normal((Hkv, num_pages, ps, D)).astype(np.float32)

        # Scattered layout holding the SAME logical cache content.
        perm = rng.permutation(num_pages - 1) + 1
        scat_table = perm[run_table - 1].astype(np.int32)
        kp_scat = np.empty_like(kp_run)
        vp_scat = np.empty_like(vp_run)
        kp_scat[:, perm] = kp_run[:, 1:]
        vp_scat[:, perm] = vp_run[:, 1:]
        kp_scat[:, 0] = kp_run[:, 0]
        vp_scat[:, 0] = vp_run[:, 0]

        for ppcb in (2, 4):
            got_run = paged_attention_fa(
                q, jnp.asarray(kp_run), jnp.asarray(vp_run),
                jnp.asarray(run_table), lengths, lengths - 1,
                pages_per_block=ppcb)
            got_scat = paged_attention_fa(
                q, jnp.asarray(kp_scat), jnp.asarray(vp_scat),
                jnp.asarray(scat_table), lengths, lengths - 1,
                pages_per_block=ppcb)
            np.testing.assert_allclose(
                np.asarray(got_run), np.asarray(got_scat),
                rtol=2e-5, atol=2e-5, err_msg=f"ppcb={ppcb}")

    def test_mixed_run_and_scatter_slots(self, rng):
        """One slot contiguous, one scattered, in the same call."""
        from vis_zephyr_tpu.ops.paged_attention import (
            paged_attention_fa, paged_attention_reference,
        )

        B, Hq, Hkv, D, ps, pps = 2, 4, 2, 32, 16, 4
        num_pages = 24
        q1 = rng.standard_normal((B, Hq, D)).astype(np.float32)
        kp = rng.standard_normal((Hkv, num_pages, ps, D)).astype(np.float32)
        vp = rng.standard_normal((Hkv, num_pages, ps, D)).astype(np.float32)
        table = np.asarray([[5, 6, 7, 8],       # run
                            [11, 3, 17, 9]],    # scattered
                           np.int32)
        lengths = jnp.asarray([60, 55], jnp.int32)
        got = paged_attention_fa(
            jnp.asarray(q1[:, None]), jnp.asarray(kp), jnp.asarray(vp),
            jnp.asarray(table), lengths, lengths - 1, pages_per_block=2
        )[:, 0]
        ref = paged_attention_reference(
            jnp.asarray(q1), jnp.asarray(kp), jnp.asarray(vp),
            jnp.asarray(table), lengths)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)


class TestFlashSelfTerm:
    """`paged_attention_fa(k_new=...)`: the folded grid's online-softmax
    self-term — the selfterm decode mode's attention (pools read-only,
    q_offs = lengths)."""

    def test_matches_append_oracle(self, rng):
        from vis_zephyr_tpu.ops.paged_attention import paged_attention_fa

        for Hq, Hkv in ((8, 2), (4, 4), (8, 1)):
            q, kp, vp, table, lengths = make_case(rng, Hq=Hq, Hkv=Hkv)
            B, _, D = q.shape
            k_new = jnp.asarray(rng.standard_normal((B, Hkv, D)), jnp.float32)
            v_new = jnp.asarray(rng.standard_normal((B, Hkv, D)), jnp.float32)
            got = paged_attention_fa(q[:, None], kp, vp, table, lengths,
                                     lengths, k_new=k_new, v_new=v_new)[:, 0]
            ref = paged_attention_reference(q, kp, vp, table, lengths,
                                            k_new, v_new)
            np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                       rtol=2e-5, atol=2e-5,
                                       err_msg=f"Hq={Hq} Hkv={Hkv}")

    def test_zero_length_attends_self_only(self, rng):
        from vis_zephyr_tpu.ops.paged_attention import paged_attention_fa

        q, kp, vp, table, _ = make_case(rng, B=2)
        B, Hq, D = q.shape
        Hkv = kp.shape[0]
        lengths = jnp.asarray([0, 3], jnp.int32)
        k_new = jnp.asarray(rng.standard_normal((B, Hkv, D)), jnp.float32)
        v_new = jnp.asarray(rng.standard_normal((B, Hkv, D)), jnp.float32)
        got = paged_attention_fa(q[:, None], kp, vp, table, lengths, lengths,
                                 k_new=k_new, v_new=v_new)[:, 0]
        # Length-0 slot: softmax over the self term alone == v_new per group.
        G = Hq // Hkv
        expect = np.repeat(np.asarray(v_new[0]), G, axis=0)
        np.testing.assert_allclose(np.asarray(got[0]), expect,
                                   rtol=2e-5, atol=2e-5)

    def test_quantized_pools_unquantized_self(self, rng):
        """Self-term K/V stays float even over int8 pools."""
        from vis_zephyr_tpu.ops.paged_attention import (
            dequant_kv_pool, paged_attention_fa, quantize_kv_pool,
        )

        q, kp, vp, table, lengths = make_case(rng)
        B, _, D = q.shape
        Hkv = kp.shape[0]
        k_new = jnp.asarray(rng.standard_normal((B, Hkv, D)), jnp.float32)
        v_new = jnp.asarray(rng.standard_normal((B, Hkv, D)), jnp.float32)
        kq, ks = quantize_kv_pool(kp)
        vq, vs = quantize_kv_pool(vp)
        got = paged_attention_fa(q[:, None], kq, vq, table, lengths, lengths,
                                 k_scales=ks, v_scales=vs,
                                 k_new=k_new, v_new=v_new)[:, 0]
        ref = paged_attention_reference(
            q, dequant_kv_pool(kq, ks, jnp.float32),
            dequant_kv_pool(vq, vs, jnp.float32), table, lengths,
            k_new, v_new)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-3, atol=2e-3)

    def test_windowed_self_term(self, rng):
        from vis_zephyr_tpu.ops.paged_attention import paged_attention_fa

        q, kp, vp, table, _ = make_case(rng, B=2, pages_per_seq=6)
        B, Hq, D = q.shape
        Hkv = kp.shape[0]
        lengths = jnp.asarray([80, 7], jnp.int32)
        k_new = jnp.asarray(rng.standard_normal((B, Hkv, D)), jnp.float32)
        v_new = jnp.asarray(rng.standard_normal((B, Hkv, D)), jnp.float32)
        for w in (8, 32):
            got = paged_attention_fa(q[:, None], kp, vp, table, lengths,
                                     lengths, sliding_window=w,
                                     k_new=k_new, v_new=v_new)[:, 0]
            ref = paged_attention_reference(q, kp, vp, table, lengths,
                                            k_new, v_new, sliding_window=w)
            np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                       rtol=2e-5, atol=2e-5,
                                       err_msg=f"window={w}")


class TestBulkRowWrite:
    """`paged_kv_update_rows{,_q}`: one strided DMA per slot writes every
    layer's new row (the selfterm decode mode's post-scan write)."""

    def _setup(self, rng, L=3, B=4, Hkv=2, D=32, ps=16, P=8):
        kp = jnp.asarray(rng.standard_normal((Hkv, L * P, ps, D)), jnp.float32)
        vp = jnp.asarray(rng.standard_normal((Hkv, L * P, ps, D)), jnp.float32)
        ks = jnp.asarray(rng.standard_normal((L, B, Hkv, D)), jnp.float32)
        vs = jnp.asarray(rng.standard_normal((L, B, Hkv, D)), jnp.float32)
        pages = jnp.asarray(rng.permutation(P)[:B], jnp.int32)
        offsets = jnp.asarray(rng.integers(0, ps, (B,)), jnp.int32)
        return kp, vp, ks, vs, pages, offsets, (L, B, Hkv, D, ps, P)

    def _oracle(self, pool, rows, pages, offsets, L, P):
        # pool [Hkv, L*P, ps, D] viewed [Hkv, L, P, ps, D]; rows [L, B, Hkv, D]
        out = np.asarray(pool).reshape(pool.shape[0], L, P, *pool.shape[2:]).copy()
        B = rows.shape[1]
        for b in range(B):
            out[:, :, int(pages[b]), int(offsets[b])] = (
                np.asarray(rows)[:, b].transpose(1, 0, 2))
        return out.reshape(np.asarray(pool).shape)

    def test_matches_scatter_oracle(self, rng):
        from vis_zephyr_tpu.ops.paged_attention import paged_kv_update_rows

        kp, vp, ks, vs, pages, offsets, (L, B, Hkv, D, ps, P) = self._setup(rng)
        ko = self._oracle(kp, ks, pages, offsets, L, P)
        vo = self._oracle(vp, vs, pages, offsets, L, P)
        kp2, vp2 = paged_kv_update_rows(kp, vp, ks, vs, pages, offsets)
        np.testing.assert_allclose(np.asarray(kp2), ko, rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(np.asarray(vp2), vo, rtol=1e-6, atol=1e-6)

    def test_duplicate_trash_page_benign(self, rng):
        """Inactive slots all write page 0 (trash): later slots win, real
        pages untouched."""
        from vis_zephyr_tpu.ops.paged_attention import paged_kv_update_rows

        kp, vp, ks, vs, _, _, (L, B, Hkv, D, ps, P) = self._setup(rng)
        pages = jnp.zeros((B,), jnp.int32)
        offsets = jnp.zeros((B,), jnp.int32)
        kp0 = np.asarray(kp).reshape(Hkv, L, P, ps, D).copy()
        kp2, vp2 = paged_kv_update_rows(kp, vp, ks, vs, pages, offsets)
        got = np.asarray(kp2).reshape(Hkv, L, P, ps, D)
        np.testing.assert_allclose(got[:, :, 1:], kp0[:, :, 1:])

    def test_quant_matches_quantize_kv(self, rng):
        from vis_zephyr_tpu.ops.paged_attention import (
            paged_kv_update_rows_q, quantize_kv,
        )

        kp, vp, ks, vs, pages, offsets, (L, B, Hkv, D, ps, P) = self._setup(rng)
        kq = jnp.zeros(kp.shape, jnp.int8)
        vq = jnp.zeros(vp.shape, jnp.int8)
        ksp = jnp.zeros(kp.shape[:2] + (1, ps), jnp.float32)
        vsp = jnp.zeros_like(ksp)
        kq2, vq2, ksp2, vsp2 = paged_kv_update_rows_q(
            kq, vq, ksp, vsp, ks, vs, pages, offsets)
        want_q, want_s = quantize_kv(ks)   # [L, B, Hkv, D], [L, B, Hkv, 1]
        got_q = np.asarray(kq2).reshape(Hkv, L, P, ps, D)
        got_s = np.asarray(ksp2).reshape(Hkv, L, P, 1, ps)
        for b in range(B):
            np.testing.assert_array_equal(
                got_q[:, :, int(pages[b]), int(offsets[b])],
                np.asarray(want_q)[:, b].transpose(1, 0, 2))
            np.testing.assert_allclose(
                got_s[:, :, int(pages[b]), 0, int(offsets[b])],
                np.asarray(want_s)[:, b, :, 0].T, rtol=1e-6)


class TestPagedKVUpdateQuant:
    """`paged_kv_update_q`: in-VMEM quantize + in-place int8 row/scale write."""

    def test_written_rows_match_quantize_kv(self, rng):
        from vis_zephyr_tpu.ops.paged_attention import paged_kv_update_q, quantize_kv

        Hkv, N, ps, D, L, B = 2, 16, 8, 128, 3, 4
        kp = jnp.zeros((Hkv, N, ps, D), jnp.int8)
        vp = jnp.zeros((Hkv, N, ps, D), jnp.int8)
        ksp = jnp.zeros((Hkv, N, 1, ps), jnp.float32)
        vsp = jnp.zeros((Hkv, N, 1, ps), jnp.float32)
        ks = jnp.asarray(rng.standard_normal((L, B, Hkv, D)), jnp.float32)
        vs = jnp.asarray(rng.standard_normal((L, B, Hkv, D)), jnp.float32)
        pids = jnp.asarray(rng.permutation(N)[: L * B].reshape(L, B), jnp.int32)
        offs = jnp.asarray(rng.integers(0, ps, (B,)), jnp.int32)

        ref_kq, ref_ks = quantize_kv(ks)   # [L, B, Hkv, D] int8, [L, B, Hkv]
        ref_vq, ref_vs = quantize_kv(vs)
        pids_h, offs_h = np.asarray(pids), np.asarray(offs)
        got_kp, got_vp, got_ksp, got_vsp = paged_kv_update_q(
            kp, vp, ksp, vsp, ks, vs, pids, offs
        )
        got_kp, got_vp = np.asarray(got_kp), np.asarray(got_vp)
        got_ksp, got_vsp = np.asarray(got_ksp), np.asarray(got_vsp)
        touched = np.zeros((N, ps), bool)
        for l in range(L):
            for b in range(B):
                p, o = pids_h[l, b], offs_h[b]
                touched[p, o] = True
                np.testing.assert_array_equal(got_kp[:, p, o], np.asarray(ref_kq)[l, b])
                np.testing.assert_array_equal(got_vp[:, p, o], np.asarray(ref_vq)[l, b])
                np.testing.assert_allclose(
                    got_ksp[:, p, 0, o], np.asarray(ref_ks)[l, b, :, 0],
                    rtol=1e-6)
                np.testing.assert_allclose(
                    got_vsp[:, p, 0, o], np.asarray(ref_vs)[l, b, :, 0],
                    rtol=1e-6)
        # Untouched rows stay zero (pools started zeroed).
        assert (got_kp[:, ~touched] == 0).all()
        untouched_scales = np.stack(
            [got_ksp[:, p, 0, o] for p in range(got_ksp.shape[1])
             for o in range(ps) if not touched[p, o]], axis=-1)
        assert (untouched_scales == 0).all()
