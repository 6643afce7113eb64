"""Flash attention kernel vs the XLA reference (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vis_zephyr_tpu.ops.attention import attention_mask, dot_product_attention
from vis_zephyr_tpu.ops.flash_attention import flash_attention


def make_qkv(rng, B=2, T=256, Hq=4, Hkv=2, D=64):
    q = jnp.asarray(rng.standard_normal((B, T, Hq, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, T, Hkv, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, T, Hkv, D)), jnp.float32)
    return q, k, v


def reference(q, k, v, kv_valid=None, causal=True):
    B, T = q.shape[:2]
    S = k.shape[1]
    pos = jnp.broadcast_to(jnp.arange(T), (B, T))
    kpos = jnp.broadcast_to(jnp.arange(S), (B, S))
    mask = attention_mask(pos, kpos, kv_valid=kv_valid, causal=causal)
    return dot_product_attention(q, k, v, mask=mask)


class TestFlashAttention:
    def test_causal_matches_reference(self, rng):
        q, k, v = make_qkv(rng)
        got = flash_attention(q, k, v, causal=True, block_q=128, block_k=128)
        ref = reference(q, k, v, causal=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)

    def test_non_causal(self, rng):
        q, k, v = make_qkv(rng, T=128)
        got = flash_attention(q, k, v, causal=False, block_q=128, block_k=128)
        ref = reference(q, k, v, causal=False)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)

    def test_kv_padding_mask(self, rng):
        q, k, v = make_qkv(rng, B=2, T=256)
        kv_valid = np.ones((2, 256), bool)
        kv_valid[0, 100:] = False
        kv_valid[1, 37:] = False
        got = flash_attention(q, k, v, kv_valid=jnp.asarray(kv_valid), block_q=128, block_k=128)
        ref = reference(q, k, v, kv_valid=jnp.asarray(kv_valid))
        # Compare only valid query rows (invalid rows are zeroed by flash,
        # garbage-but-masked downstream in the reference path).
        for b, L in [(0, 100), (1, 37)]:
            np.testing.assert_allclose(
                np.asarray(got[b, :L]), np.asarray(ref[b, :L]), rtol=2e-5, atol=2e-5
            )

    def test_fully_masked_rows_are_zero_not_nan(self, rng):
        q, k, v = make_qkv(rng, B=1, T=128)
        kv_valid = np.zeros((1, 128), bool)
        kv_valid[0, :64] = True
        got = np.asarray(
            flash_attention(q, k, v, kv_valid=jnp.asarray(kv_valid), block_q=128, block_k=128)
        )
        assert np.isfinite(got).all()

    def test_gqa_group_mapping(self, rng):
        q, k, v = make_qkv(rng, Hq=8, Hkv=2, T=128)
        got = flash_attention(q, k, v, block_q=128, block_k=128)
        ref = reference(q, k, v)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)

    def test_gradients_flow(self, rng):
        q, k, v = make_qkv(rng, B=1, T=128)

        def loss_flash(q, k, v):
            return flash_attention(q, k, v, block_q=128, block_k=128).sum()

        def loss_ref(q, k, v):
            return reference(q, k, v).sum()

        gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(gf, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4)

    def test_gradients_with_padding_mask(self, rng):
        q, k, v = make_qkv(rng, B=2, T=256)
        kv_valid = np.ones((2, 256), bool)
        kv_valid[0, 180:] = False
        kv_valid[1, 64:] = False
        kvj = jnp.asarray(kv_valid)

        # Zero the upstream gradient at padded q rows (training masks them).
        gmask = jnp.asarray(kv_valid)[:, :, None, None]

        def loss_flash(q, k, v):
            return (flash_attention(q, k, v, kv_valid=kvj, block_q=128, block_k=128) * gmask).sum()

        def loss_ref(q, k, v):
            return (reference(q, k, v, kv_valid=kvj) * gmask).sum()

        gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(gf, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4)

    def test_gradients_gqa(self, rng):
        q, k, v = make_qkv(rng, B=1, T=128, Hq=8, Hkv=2)

        def loss_flash(q, k, v):
            return (flash_attention(q, k, v, block_q=128, block_k=128) ** 2).sum()

        def loss_ref(q, k, v):
            return (reference(q, k, v) ** 2).sum()

        gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(gf, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=3e-4, atol=3e-4)

    def test_rejects_non_tiling_lengths(self, rng):
        q, k, v = make_qkv(rng, T=100)
        with pytest.raises(ValueError):
            flash_attention(q, k, v, block_q=128, block_k=128)


class TestFlashUnderMesh:
    """flash_attention(mesh=...): the kernel runs per TP shard over its
    heads via shard_map (TP prefill previously fell back to XLA
    attention)."""

    def _mesh(self, n=2):
        from vis_zephyr_tpu.parallel.mesh import create_mesh

        return create_mesh(model=n)

    def test_matches_unsharded(self, rng):
        q, k, v = make_qkv(rng, Hq=8, Hkv=4)
        mesh = self._mesh(2)
        got = flash_attention(q, k, v, mesh=mesh)
        want = flash_attention(q, k, v)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)

    def test_gqa_groups_whole_per_shard(self, rng):
        q, k, v = make_qkv(rng, Hq=8, Hkv=2)
        mesh = self._mesh(2)  # Hkv=2 over 2 shards: one kv head each
        valid = np.asarray(rng.random((2, 256)) > 0.3)
        valid[:, 0] = True  # no fully-masked rows (flash: zeros; XLA ref
        #                     helper: softmax over -inf — different contract)
        kv_valid = jnp.asarray(valid)
        got = flash_attention(q, k, v, kv_valid=kv_valid, mesh=mesh)
        want = reference(q, k, v, kv_valid=kv_valid)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)

    def test_prefill_kv_under_mesh_uses_flash(self, rng):
        """The TP batcher admission path: _prefill_kv(attn_mesh=mesh) with
        flash forced on matches the XLA path bit-for-bit at tiny scale."""
        from vis_zephyr_tpu.config import tiny_config
        from vis_zephyr_tpu.models.vis_zephyr import init_vis_zephyr
        from vis_zephyr_tpu.models.mistral import mistral_forward
        from vis_zephyr_tpu.models.mistral import embed as dec_embed

        cfg = tiny_config()
        dec = cfg.decoder
        if dec.head_dim % 2:
            pytest.skip("tiny head_dim")
        params = init_vis_zephyr(cfg, jax.random.PRNGKey(0))
        mesh = self._mesh(2)
        ids = jnp.asarray(rng.integers(5, dec.vocab_size, (1, 128)))
        embeds = dec_embed(params["decoder"], ids)
        pos = jnp.broadcast_to(jnp.arange(128), (1, 128))
        # Force flash under the mesh (the CPU auto-gate would disable it);
        # block sizes handle T=128.
        flash_logits, _ = mistral_forward(
            params["decoder"], embeds, dec, pos, use_flash=True,
            attn_mesh=mesh)
        xla_logits, _ = mistral_forward(
            params["decoder"], embeds, dec, pos, use_flash=False)
        np.testing.assert_allclose(np.asarray(flash_logits),
                                   np.asarray(xla_logits),
                                   rtol=2e-3, atol=2e-3)
