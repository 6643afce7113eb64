"""KV-fused pool layout tests (interpret mode).

The fused layout stores each page's K rows then its V rows in ONE pool
array ([Hkv, N, 2·ps, D]; scales [Hkv, N, 1, 2·ps]) so the decode kernel
moves each page block in one DMA instead of two (four with scales). Same
bytes, same math — every result here is pinned EQUAL (or allclose at the
kernel level) to the split-pool layout, which is itself oracle-tested in
tests/test_paged_attention.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vis_zephyr_tpu.config import tiny_config
from vis_zephyr_tpu.models.vis_zephyr import init_vis_zephyr
from vis_zephyr_tpu.ops.paged_attention import (
    paged_attention,
    paged_attention_fa,
    paged_attention_reference,
    paged_kv_update,
    paged_kv_update_q,
    paged_kv_update_rows,
    paged_kv_update_rows_q,
    quantize_kv_pool,
)
from vis_zephyr_tpu.serve.generate import SamplingConfig, generate
from vis_zephyr_tpu.serve.paged import PagedBatcher


def fuse_pools(k_pages, v_pages):
    """Split [Hkv, N, ps, D] pools → fused [Hkv, N, 2·ps, D]."""
    return jnp.concatenate([k_pages, v_pages], axis=2)


def fuse_scales(k_scales, v_scales):
    """Split [Hkv, N, 1, ps] scale pools → fused [Hkv, N, 1, 2·ps]."""
    return jnp.concatenate([k_scales, v_scales], axis=3)


def split_pools(kv_pages):
    ps = kv_pages.shape[2] // 2
    return kv_pages[:, :, :ps], kv_pages[:, :, ps:]


def split_scales(kv_scales):
    ps = kv_scales.shape[3] // 2
    return kv_scales[:, :, :, :ps], kv_scales[:, :, :, ps:]


def make_case(rng, B=3, Hq=8, Hkv=2, D=64, page_size=16, pages_per_seq=4,
              num_pages=32):
    lengths = np.asarray(
        [rng.integers(1, pages_per_seq * page_size + 1) for _ in range(B)])
    table = rng.permutation(num_pages)[: B * pages_per_seq].reshape(
        B, pages_per_seq)
    q = rng.standard_normal((B, Hq, D)).astype(np.float32)
    k_pages = rng.standard_normal((Hkv, num_pages, page_size, D)).astype(np.float32)
    v_pages = rng.standard_normal((Hkv, num_pages, page_size, D)).astype(np.float32)
    return (jnp.asarray(q), jnp.asarray(k_pages), jnp.asarray(v_pages),
            jnp.asarray(table, jnp.int32), jnp.asarray(lengths, jnp.int32))


class TestFusedAttention:
    def test_matches_split_and_oracle(self, rng):
        for Hq, Hkv in ((8, 2), (4, 4), (8, 1)):
            q, kp, vp, table, lengths = make_case(rng, Hq=Hq, Hkv=Hkv)
            fused = paged_attention(q, fuse_pools(kp, vp), None, table, lengths)
            ref = paged_attention_reference(q, kp, vp, table, lengths)
            np.testing.assert_allclose(
                np.asarray(fused), np.asarray(ref), rtol=2e-5, atol=2e-5)

    def test_selfterm_matches_oracle(self, rng):
        q, kp, vp, table, lengths = make_case(rng)
        B, _, D = q.shape
        Hkv = kp.shape[0]
        k_new = jnp.asarray(rng.standard_normal((B, Hkv, D)), jnp.float32)
        v_new = jnp.asarray(rng.standard_normal((B, Hkv, D)), jnp.float32)
        fused = paged_attention(q, fuse_pools(kp, vp), None, table, lengths,
                                k_new=k_new, v_new=v_new)
        ref = paged_attention_reference(q, kp, vp, table, lengths, k_new, v_new)
        np.testing.assert_allclose(
            np.asarray(fused), np.asarray(ref), rtol=2e-5, atol=2e-5)

    def test_windowed(self, rng):
        q, kp, vp, table, _ = make_case(rng)
        lengths = jnp.asarray([60, 33, 17], jnp.int32)
        window = 24
        fused = paged_attention(q, fuse_pools(kp, vp), None, table, lengths,
                                sliding_window=window)
        ref = paged_attention_reference(q, kp, vp, table, lengths,
                                        sliding_window=window)
        np.testing.assert_allclose(
            np.asarray(fused), np.asarray(ref), rtol=2e-5, atol=2e-5)

    def test_multi_row_verify_shape(self, rng):
        """S>1 speculative-verify rows through the fused pool equal the
        split-pool kernel bit for bit (same compute order)."""
        q1, kp, vp, table, lengths = make_case(rng, B=2, pages_per_seq=3,
                                               num_pages=16)
        B, Hq, D = q1.shape
        S = 3
        q = jnp.asarray(rng.standard_normal((B, S, Hq, D)), jnp.float32)
        lengths = jnp.minimum(lengths + S, table.shape[1] * kp.shape[2])
        q_offs = lengths - S
        split = paged_attention_fa(q, kp, vp, table, lengths, q_offs)
        fused = paged_attention_fa(q, fuse_pools(kp, vp), None, table,
                                   lengths, q_offs)
        np.testing.assert_allclose(
            np.asarray(fused), np.asarray(split), rtol=1e-6, atol=1e-6)

    def test_quantized_matches_split(self, rng):
        q, kp, vp, table, lengths = make_case(rng)
        kq, ks = quantize_kv_pool(kp)
        vq, vs = quantize_kv_pool(vp)
        split = paged_attention(q, kq, vq, table, lengths,
                                k_scales=ks, v_scales=vs)
        fused = paged_attention(q, fuse_pools(kq, vq), None, table, lengths,
                                k_scales=fuse_scales(ks, vs))
        np.testing.assert_allclose(
            np.asarray(fused), np.asarray(split), rtol=1e-6, atol=1e-6)

    def test_quantized_windowed_selfterm(self, rng):
        q, kp, vp, table, _ = make_case(rng)
        B, _, D = q.shape
        Hkv = kp.shape[0]
        lengths = jnp.asarray([63, 34, 9], jnp.int32)
        k_new = jnp.asarray(rng.standard_normal((B, Hkv, D)), jnp.float32)
        v_new = jnp.asarray(rng.standard_normal((B, Hkv, D)), jnp.float32)
        kq, ks = quantize_kv_pool(kp)
        vq, vs = quantize_kv_pool(vp)
        split = paged_attention(q, kq, vq, table, lengths, k_new=k_new,
                                v_new=v_new, sliding_window=24,
                                k_scales=ks, v_scales=vs)
        fused = paged_attention(q, fuse_pools(kq, vq), None, table, lengths,
                                k_new=k_new, v_new=v_new, sliding_window=24,
                                k_scales=fuse_scales(ks, vs))
        np.testing.assert_allclose(
            np.asarray(fused), np.asarray(split), rtol=1e-6, atol=1e-6)


class TestFusedUpdates:
    def test_kv_update_matches_split(self, rng):
        _, kp, vp, _, _ = make_case(rng)
        Hkv, N, ps, D = kp.shape
        L, B = 2, 3
        ks = jnp.asarray(rng.standard_normal((L, B, Hkv, D)), jnp.float32)
        vs = jnp.asarray(rng.standard_normal((L, B, Hkv, D)), jnp.float32)
        pids = jnp.asarray(rng.integers(1, N, (L, B)), jnp.int32)
        offs = jnp.asarray(rng.integers(0, ps, (B,)), jnp.int32)
        kvp_in = fuse_pools(kp, vp)  # before the donating split call
        kp2, vp2 = paged_kv_update(kp, vp, ks, vs, pids, offs)
        kvp, none = paged_kv_update(kvp_in, None, ks, vs, pids, offs)
        assert none is None
        ek, ev = split_pools(kvp)
        np.testing.assert_array_equal(np.asarray(ek), np.asarray(kp2))
        np.testing.assert_array_equal(np.asarray(ev), np.asarray(vp2))

    def test_kv_update_q_matches_split(self, rng):
        _, kp, vp, _, _ = make_case(rng)
        Hkv, N, ps, D = kp.shape
        kq, ksc = quantize_kv_pool(kp)
        vq, vsc = quantize_kv_pool(vp)
        L, B = 2, 3
        ks = jnp.asarray(rng.standard_normal((L, B, Hkv, D)), jnp.float32)
        vs = jnp.asarray(rng.standard_normal((L, B, Hkv, D)), jnp.float32)
        pids = jnp.asarray(rng.integers(1, N, (L, B)), jnp.int32)
        offs = jnp.asarray(rng.integers(0, ps, (B,)), jnp.int32)
        kvp_in = fuse_pools(kq, vq)  # before the donating split call
        kvs_in = fuse_scales(ksc, vsc)
        kp2, vp2, ks2, vs2 = paged_kv_update_q(kq, vq, ksc, vsc, ks, vs,
                                               pids, offs)
        kvp, _, kvs, _ = paged_kv_update_q(
            kvp_in, None, kvs_in, None, ks, vs, pids, offs)
        ek, ev = split_pools(kvp)
        eks, evs = split_scales(kvs)
        np.testing.assert_array_equal(np.asarray(ek), np.asarray(kp2))
        np.testing.assert_array_equal(np.asarray(ev), np.asarray(vp2))
        np.testing.assert_array_equal(np.asarray(eks), np.asarray(ks2))
        np.testing.assert_array_equal(np.asarray(evs), np.asarray(vs2))

    def test_update_rows_matches_split(self, rng):
        _, kp, vp, _, _ = make_case(rng, num_pages=12)
        Hkv, N, ps, D = kp.shape
        L = 3
        P = N // L
        B = 4
        ks = jnp.asarray(rng.standard_normal((L, B, Hkv, D)), jnp.float32)
        vs = jnp.asarray(rng.standard_normal((L, B, Hkv, D)), jnp.float32)
        pages = jnp.asarray(rng.permutation(P)[:B], jnp.int32)
        offs = jnp.asarray(rng.integers(0, ps, (B,)), jnp.int32)
        kvp_in = fuse_pools(kp, vp)  # before the donating split call
        kp2, vp2 = paged_kv_update_rows(kp, vp, ks, vs, pages, offs)
        kvp, none = paged_kv_update_rows(kvp_in, None, ks, vs, pages, offs)
        assert none is None
        ek, ev = split_pools(kvp)
        np.testing.assert_array_equal(np.asarray(ek), np.asarray(kp2))
        np.testing.assert_array_equal(np.asarray(ev), np.asarray(vp2))

    def test_update_rows_q_matches_split(self, rng):
        _, kp, vp, _, _ = make_case(rng, num_pages=12)
        Hkv, N, ps, D = kp.shape
        kq, ksc = quantize_kv_pool(kp)
        vq, vsc = quantize_kv_pool(vp)
        L = 3
        P = N // L
        B = 4
        ks = jnp.asarray(rng.standard_normal((L, B, Hkv, D)), jnp.float32)
        vs = jnp.asarray(rng.standard_normal((L, B, Hkv, D)), jnp.float32)
        pages = jnp.asarray(rng.permutation(P)[:B], jnp.int32)
        offs = jnp.asarray(rng.integers(0, ps, (B,)), jnp.int32)
        kvp_in = fuse_pools(kq, vq)  # before the donating split call
        kvs_in = fuse_scales(ksc, vsc)
        kp2, vp2, ks2, vs2 = paged_kv_update_rows_q(kq, vq, ksc, vsc,
                                                    ks, vs, pages, offs)
        kvp, _, kvs, _ = paged_kv_update_rows_q(
            kvp_in, None, kvs_in, None, ks, vs, pages, offs)
        ek, ev = split_pools(kvp)
        eks, evs = split_scales(kvs)
        np.testing.assert_array_equal(np.asarray(ek), np.asarray(kp2))
        np.testing.assert_array_equal(np.asarray(ev), np.asarray(vp2))
        np.testing.assert_array_equal(np.asarray(eks), np.asarray(ks2))
        np.testing.assert_array_equal(np.asarray(evs), np.asarray(vs2))


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_config()
    params = init_vis_zephyr(cfg, jax.random.PRNGKey(0))
    return cfg, params


def _run(batcher, requests):
    handles = [batcher.submit(ids, im, pv) for ids, im, pv in requests]
    batcher.run_until_drained()
    return [list(batcher.stream(h)) for h in handles]


def make_request(cfg, rng, T, with_image=False, P=3):
    from vis_zephyr_tpu.constants import IMAGE_TOKEN_INDEX

    H = cfg.vision.image_size
    ids = rng.integers(5, cfg.decoder.vocab_size, (T,))
    images = patch_valid = None
    if with_image:
        ids[1] = IMAGE_TOKEN_INDEX
        images = rng.standard_normal((P, H, H, 3)).astype(np.float32)
        patch_valid = np.ones((P,), bool)
    return ids, images, patch_valid


class TestFusedBatcher:
    def test_matches_standalone_generate(self, setup, rng):
        cfg, params = setup
        sampling = SamplingConfig(max_new_tokens=6, temperature=0.0,
                                  eos_token_id=-1)
        batcher = PagedBatcher(
            params, cfg, max_slots=4, cache_len=64, page_size=16,
            sampling=sampling, num_pages=32, kv_fused=True,
        )
        requests = [make_request(cfg, rng, T, with_image=True)
                    for T in (5, 8, 6)]
        for (ids, im, pv), got in zip(requests, _run(batcher, requests)):
            solo = generate(
                params, jnp.asarray(ids[None]),
                None if im is None else jnp.asarray(im[None]),
                None if pv is None else jnp.asarray(pv[None]),
                cfg, sampling, cache_len=64,
            )[0]
            np.testing.assert_array_equal(got, solo)

    @pytest.mark.parametrize("kv_quant", [False, True])
    def test_token_identical_to_split_layout(self, setup, rng, kv_quant):
        cfg, params = setup
        sampling = SamplingConfig(max_new_tokens=8, temperature=0.0,
                                  eos_token_id=-1)
        reqs = [make_request(cfg, rng, T) for T in (4, 9, 6, 13)]
        outs = {}
        for fused in (False, True):
            batcher = PagedBatcher(
                params, cfg, max_slots=4, cache_len=64, page_size=16,
                sampling=sampling, num_pages=32, kv_quant=kv_quant,
                kv_fused=fused,
            )
            outs[fused] = _run(batcher, reqs)
        for a, b in zip(outs[False], outs[True]):
            np.testing.assert_array_equal(a, b)

    def test_fused_multi_step_and_speculation(self, setup, rng):
        """kv_fused composed with the other serving features stays exact:
        multi-step bursts, then prompt-lookup speculation (which drives the
        fused paged_kv_update + multi-row verify path)."""
        cfg, params = setup
        sampling = SamplingConfig(max_new_tokens=10, temperature=0.0,
                                  eos_token_id=-1)
        reqs = [make_request(cfg, rng, T) for T in (5, 11, 7)]
        base = None
        for kwargs in ({}, {"multi_step": 4}, {"lookahead": 3},
                       {"multi_step": 3, "kv_quant": True}):
            batcher = PagedBatcher(
                params, cfg, max_slots=4, cache_len=64, page_size=16,
                sampling=sampling, num_pages=32, kv_fused=True, **kwargs,
            )
            got = _run(batcher, reqs)
            if base is None or "kv_quant" in kwargs:
                # int8 pools round differently from bf16 pools by design —
                # only pin the quant run against its own split-layout twin.
                if "kv_quant" in kwargs:
                    twin = PagedBatcher(
                        params, cfg, max_slots=4, cache_len=64, page_size=16,
                        sampling=sampling, num_pages=32, kv_fused=False,
                        **kwargs,
                    )
                    for a, b in zip(got, _run(twin, reqs)):
                        np.testing.assert_array_equal(a, b)
                else:
                    base = got
                continue
            for a, b in zip(got, base):
                np.testing.assert_array_equal(a, b)

    def test_fused_windowed_long_sequence(self, rng):
        """cache_len beyond the sliding window with fused pools: matches the
        split-layout batcher token for token."""
        import dataclasses

        base = tiny_config()
        cfg = dataclasses.replace(
            base, decoder=dataclasses.replace(base.decoder, sliding_window=16))
        params = init_vis_zephyr(cfg, jax.random.PRNGKey(1))
        sampling = SamplingConfig(max_new_tokens=12, temperature=0.0,
                                  eos_token_id=-1)
        reqs = [make_request(cfg, rng, T) for T in (18, 25)]
        outs = {}
        for fused in (False, True):
            batcher = PagedBatcher(
                params, cfg, max_slots=2, cache_len=48, page_size=16,
                sampling=sampling, num_pages=16, kv_fused=fused,
            )
            outs[fused] = _run(batcher, reqs)
        for a, b in zip(outs[False], outs[True]):
            np.testing.assert_array_equal(a, b)


class TestFusedBatcherTP:
    def test_token_identical_under_mesh(self, setup, rng):
        """Fused pools shard over kv heads under the model-axis TP mesh
        exactly like split pools; outputs equal the single-device fused
        batcher."""
        from vis_zephyr_tpu.parallel.mesh import create_mesh

        cfg, params = setup
        sampling = SamplingConfig(max_new_tokens=6, temperature=0.0,
                                  eos_token_id=-1)
        reqs = [make_request(cfg, rng, T) for T in (5, 9)]
        single = PagedBatcher(
            params, cfg, max_slots=2, cache_len=64, page_size=16,
            sampling=sampling, num_pages=16, kv_fused=True,
        )
        base = _run(single, reqs)
        mesh = create_mesh(model=2)  # tiny Hkv=2 → one kv head per shard
        for kv_quant in (False, True):
            tp = PagedBatcher(
                params, cfg, max_slots=2, cache_len=64, page_size=16,
                sampling=sampling, num_pages=16, kv_fused=True, mesh=mesh,
                kv_quant=kv_quant,
            )
            got = _run(tp, reqs)
            if kv_quant:
                twin = PagedBatcher(
                    params, cfg, max_slots=2, cache_len=64, page_size=16,
                    sampling=sampling, num_pages=16, kv_fused=True,
                    kv_quant=True,
                )
                for a, b in zip(got, _run(twin, reqs)):
                    np.testing.assert_array_equal(a, b)
            else:
                for a, b in zip(got, base):
                    np.testing.assert_array_equal(a, b)
