"""Multi-LoRA serving: per-request adapters on one base model.

The oracle throughout: a batcher slot running adapter `a` must produce the
SAME tokens as solo `generate` on params with adapter `a`'s leaves
attached (the single-LoRA path `qdot` already supports) — per-request
deltas through `lax.ragged_dot` are exactly per-request single-adapter
math. Index 0 is the base model (zero adapter).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vis_zephyr_tpu.config import tiny_config
from vis_zephyr_tpu.models.vis_zephyr import init_vis_zephyr
from vis_zephyr_tpu.ops.mlora import (
    build_pack,
    lora_leaves_for_adapter,
    make_random_pack,
    mlora_delta,
    pack_num_adapters,
    ragged_ctx,
)
from vis_zephyr_tpu.serve.batching import ContinuousBatcher
from vis_zephyr_tpu.serve.generate import SamplingConfig, generate
from vis_zephyr_tpu.serve.paged import PagedBatcher
from vis_zephyr_tpu.train.lora import attach_lora


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_config()
    params = init_vis_zephyr(cfg, jax.random.PRNGKey(0))
    pack = make_random_pack(cfg, n_adapters=2, r=4, key=jax.random.PRNGKey(7))
    names = {"alpha": 1, "beta": 2}
    return cfg, params, pack, names


def solo_with_adapter(params, pack, adapter, ids, cfg, sampling):
    """Oracle: solo generate with the adapter's leaves attached (the
    single-LoRA qdot path)."""
    p = attach_lora(params, lora_leaves_for_adapter(pack, adapter))
    return generate(p, jnp.asarray(np.asarray(ids)[None]), None, None, cfg,
                    sampling, cache_len=64)[0]


class TestMloraOps:
    def test_delta_matches_dense_oracle(self, rng):
        cfg = tiny_config()
        pack = make_random_pack(cfg, 2, r=4, key=jax.random.PRNGKey(3))
        t = pack["mlp"]["down"]
        tgt = {"a": t["a"][1], "b": t["b"][1], "scale": t["scale"][1]}
        B, T, K = 5, 2, tgt["a"].shape[-2]
        x = jnp.asarray(rng.standard_normal((B, T, K)), jnp.float32)
        idx = jnp.asarray([2, 0, 1, 2, 0], jnp.int32)
        got = np.asarray(mlora_delta(x, tgt, ragged_ctx(idx, 3)))
        for b in range(B):
            a_i = np.asarray(tgt["a"][int(idx[b])])
            b_i = np.asarray(tgt["b"][int(idx[b])])
            ref = np.asarray(x[b]) @ a_i @ b_i * float(tgt["scale"][int(idx[b])])
            np.testing.assert_allclose(got[b], ref, rtol=1e-5, atol=1e-5)

    def test_base_index_is_exact_zero(self, rng):
        cfg = tiny_config()
        pack = make_random_pack(cfg, 2, r=4, key=jax.random.PRNGKey(3))
        t = pack["attn"]["q"]
        tgt = {"a": t["a"][0], "b": t["b"][0], "scale": t["scale"][0]}
        x = jnp.asarray(rng.standard_normal((3, 1, tgt["a"].shape[-2])),
                        jnp.float32)
        d = mlora_delta(x, tgt, ragged_ctx(jnp.zeros((3,), jnp.int32), 3))
        assert float(jnp.abs(d).max()) == 0.0

    def test_build_pack_rank_padding_and_missing_targets(self):
        cfg = tiny_config()
        dec = cfg.decoder
        L, D = dec.num_layers, dec.hidden_size
        nq = dec.num_heads * dec.head_dim

        def adapter(r, targets):
            out = {}
            for t, (K, M) in targets.items():
                out[f"decoder/layers/{t}"] = {
                    "lora_a": jnp.ones((L, K, r)) * 0.1,
                    "lora_b": jnp.ones((L, r, M)) * 0.2,
                    "lora_scale": jnp.full((L,), 2.0),
                }
            return out

        a1 = adapter(2, {"attn/q": (D, nq)})
        a2 = adapter(4, {"attn/q": (D, nq), "mlp/down":
                         (dec.intermediate_size, D)})
        pack = build_pack([a1, a2], L)
        assert pack_num_adapters(pack) == 3
        q = pack["attn"]["q"]
        assert q["a"].shape == (L, 3, D, 4)  # padded to rmax=4
        # Adapter 1's padded rank dims are zero; base (0) fully zero.
        assert float(jnp.abs(q["a"][:, 1, :, 2:]).max()) == 0.0
        assert float(jnp.abs(q["a"][:, 0]).max()) == 0.0
        # a1 contributes zeros for the target it lacks.
        assert float(jnp.abs(pack["mlp"]["down"]["a"][:, 1]).max()) == 0.0


class TestDenseBatcherMultiLora:
    def test_mixed_adapters_match_solo(self, setup, rng):
        cfg, params, pack, names = setup
        sampling = SamplingConfig(max_new_tokens=6, temperature=0.0,
                                  eos_token_id=-1)
        batcher = ContinuousBatcher(
            params, cfg, max_slots=4, cache_len=64, sampling=sampling,
            mlora=pack, adapter_names=names,
        )
        reqs = [(rng.integers(5, cfg.decoder.vocab_size, (T,)), ad)
                for T, ad in ((5, None), (8, "alpha"), (6, "beta"),
                              (7, "alpha"))]
        handles = [batcher.submit(ids, adapter=ad) for ids, ad in reqs]
        batcher.run_until_drained()
        for (ids, ad), h in zip(reqs, handles):
            got = list(batcher.stream(h))
            solo = solo_with_adapter(
                params, pack, {"alpha": 1, "beta": 2}.get(ad, 0),
                ids, cfg, sampling)
            np.testing.assert_array_equal(got, solo)

    def test_unknown_adapter_rejected(self, setup):
        cfg, params, pack, names = setup
        batcher = ContinuousBatcher(params, cfg, max_slots=2, cache_len=64,
                                    mlora=pack, adapter_names=names)
        with pytest.raises(KeyError):
            batcher.submit(np.asarray([5, 6, 7]), adapter="nope")


class TestPagedBatcherMultiLora:
    @pytest.mark.parametrize("kw", [
        {},
        {"kv_fused": True},
        {"kv_quant": True, "kv_fused": True},
        {"multi_step": 3},
        {"lookahead": 3},
        {"prefill_chunk": 16},
    ])
    def test_mixed_adapters_match_solo(self, setup, rng, kw):
        cfg, params, pack, names = setup
        sampling = SamplingConfig(max_new_tokens=6, temperature=0.0,
                                  eos_token_id=-1)
        batcher = PagedBatcher(
            params, cfg, max_slots=4, cache_len=64, page_size=16,
            num_pages=32, sampling=sampling, mlora=pack,
            adapter_names=names, **kw,
        )
        reqs = [(rng.integers(5, cfg.decoder.vocab_size, (T,)), ad)
                for T, ad in ((5, "beta"), (9, None), (6, "alpha"))]
        handles = [batcher.submit(ids, adapter=ad) for ids, ad in reqs]
        batcher.run_until_drained()
        for (ids, ad), h in zip(reqs, handles):
            got = list(batcher.stream(h))
            solo = solo_with_adapter(
                params, pack, {"alpha": 1, "beta": 2}.get(ad, 0),
                ids, cfg, sampling)
            np.testing.assert_array_equal(got, solo)

    def test_prefix_cache_isolated_per_adapter(self, setup, rng):
        """The SAME prompt under two adapters must not share pages (adapter
        changes prompt K/V): each output equals its own solo oracle, and a
        same-adapter repeat still hits."""
        cfg, params, pack, names = setup
        sampling = SamplingConfig(max_new_tokens=6, temperature=0.0,
                                  eos_token_id=-1)
        batcher = PagedBatcher(
            params, cfg, max_slots=2, cache_len=64, page_size=16,
            num_pages=32, sampling=sampling, mlora=pack,
            adapter_names=names, prefill_chunk=16, prefix_cache=True,
        )
        ids = rng.integers(5, cfg.decoder.vocab_size, (37,))
        outs = {}
        for ad in ("alpha", "beta", "alpha"):
            h = batcher.submit(ids.copy(), adapter=ad)
            batcher.run_until_drained()
            outs.setdefault(ad, []).append(list(batcher.stream(h)))
        # Cross-adapter isolation: first beta run saw only alpha's pages →
        # zero reuse allowed; the alpha repeat may hit.
        for ad, idx in (("alpha", 1), ("beta", 2)):
            solo = solo_with_adapter(params, pack, idx, ids, cfg, sampling)
            for got in outs[ad]:
                np.testing.assert_array_equal(got, solo)
        assert batcher.prefix_cache.hits >= 1  # the alpha repeat


class TestMultiLoraTP:
    def test_paged_tp_matches_solo(self, setup, rng):
        """Multi-LoRA under the model-axis TP mesh: the pack stays
        replicated (adapters are small), deltas ride SPMD propagation
        outside the shard_map'd attention — outputs equal the solo
        oracles."""
        from vis_zephyr_tpu.parallel.mesh import create_mesh

        cfg, params, pack, names = setup
        sampling = SamplingConfig(max_new_tokens=5, temperature=0.0,
                                  eos_token_id=-1)
        mesh = create_mesh(model=2)
        batcher = PagedBatcher(
            params, cfg, max_slots=2, cache_len=64, page_size=16,
            num_pages=16, sampling=sampling, mesh=mesh, mlora=pack,
            adapter_names=names,
        )
        reqs = [(rng.integers(5, cfg.decoder.vocab_size, (6,)), "alpha"),
                (rng.integers(5, cfg.decoder.vocab_size, (8,)), "beta")]
        handles = [batcher.submit(ids, adapter=ad) for ids, ad in reqs]
        batcher.run_until_drained()
        for (ids, ad), h in zip(reqs, handles):
            solo = solo_with_adapter(params, pack, names[ad], ids, cfg,
                                     sampling)
            np.testing.assert_array_equal(list(batcher.stream(h)), solo)


class TestEngineMultiLora:
    def test_engine_routes_adapters(self, mock_tokenizer, setup):
        from vis_zephyr_tpu.serve.engine import ChatEngine

        cfg, params, pack, names = setup
        eng = ChatEngine(
            params, cfg, mock_tokenizer, max_new_tokens=4, temperature=0.0,
            continuous_batching=True, max_slots=2, cache_len=128,
            kv_cache="paged", page_size=16, prefill_chunk=16,
            mlora=pack, adapter_names=names,
        )
        try:
            base = eng.chat_text("s1", "hello w1 w2")
            alpha = eng.chat_text("s2", "hello w1 w2", adapter="alpha")
            assert isinstance(base, str) and isinstance(alpha, str)
            # The adapters are random and large-ish: replies should differ.
            assert base != alpha
        finally:
            eng.close()
