"""Multi-chip serving: the batcher under a model-axis (TP) inference mesh
must be token-identical to the single-device path.

Runs on the 8-virtual-CPU-device mesh (conftest). Replaces the reference's
`device_map="auto"` multi-GPU spread (`vis_zephyr/model/builder.py:22`)
with explicit TP shardings + SPMD propagation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vis_zephyr_tpu.config import tiny_config
from vis_zephyr_tpu.constants import IMAGE_TOKEN_INDEX
from vis_zephyr_tpu.models.vis_zephyr import init_vis_zephyr
from vis_zephyr_tpu.parallel.mesh import create_mesh
from vis_zephyr_tpu.serve.batching import ContinuousBatcher
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


class TestMeshServing:
    def test_tp_batcher_matches_single_device(self, setup, rng):
        cfg, params = setup
        mesh = create_mesh(model=8)
        sampling = SamplingConfig(max_new_tokens=6, temperature=0.0, eos_token_id=-1)
        batcher = ContinuousBatcher(
            params, cfg, max_slots=4, cache_len=256, sampling=sampling, mesh=mesh
        )
        requests = [make_request(cfg, rng, T, with_image=True) for T in (5, 8)]
        handles = [batcher.submit(ids, im, pv) for ids, im, pv in requests]
        batcher.run_until_drained()

        for (ids, im, pv), handle in zip(requests, handles):
            got = list(batcher.stream(handle))
            solo = generate(
                params, jnp.asarray(ids[None]), jnp.asarray(im[None]),
                jnp.asarray(pv[None]), cfg, sampling, cache_len=256,
            )[0]
            np.testing.assert_array_equal(got, solo)

    def test_tp_params_actually_sharded(self, setup):
        cfg, params = setup
        mesh = create_mesh(model=2)
        batcher = ContinuousBatcher(
            params, cfg, max_slots=2, cache_len=64,
            sampling=SamplingConfig(max_new_tokens=2), mesh=mesh,
        )
        kernel = batcher.params["decoder"]["layers"]["attn"]["q"]["kernel"]
        spec = kernel.sharding.spec
        assert "model" in tuple(spec), spec
        # KV cache heads ride the model axis when divisible.
        Hkv = cfg.decoder.num_kv_heads
        if Hkv % 2 == 0:
            assert batcher.cache["k"].sharding.spec[3] == "model"

    def test_tp_mixed_data_axis(self, setup, rng):
        """A data×model mesh (2×4) still decodes exactly."""
        cfg, params = setup
        mesh = create_mesh(data=2, model=4)
        sampling = SamplingConfig(max_new_tokens=4, temperature=0.0, eos_token_id=-1)
        batcher = ContinuousBatcher(
            params, cfg, max_slots=2, cache_len=128, sampling=sampling, mesh=mesh
        )
        r = make_request(cfg, rng, 6, with_image=False)
        h = batcher.submit(*r)
        batcher.run_until_drained()
        solo = generate(
            params, jnp.asarray(r[0][None]), None, None, cfg, sampling, cache_len=128
        )[0]
        np.testing.assert_array_equal(list(batcher.stream(h)), solo)


class TestMeshPagedServing:
    """Paged-KV pools under model-axis TP: kv-head-sharded pools, shard_map
    decode kernel (`serve/paged.py::_paged_attention_tp`)."""

    def test_tp_paged_matches_single_device(self, setup, rng):
        from vis_zephyr_tpu.serve.paged import PagedBatcher

        cfg, params = setup
        mesh = create_mesh(model=2)  # tiny Hkv=2 → one kv head per shard
        sampling = SamplingConfig(max_new_tokens=6, temperature=0.0, eos_token_id=-1)
        batcher = PagedBatcher(
            params, cfg, max_slots=4, cache_len=64, page_size=16,
            sampling=sampling, num_pages=32, mesh=mesh,
        )
        requests = [make_request(cfg, rng, T, with_image=True) for T in (5, 8)]
        handles = [batcher.submit(ids, im, pv) for ids, im, pv in requests]
        batcher.run_until_drained()

        for (ids, im, pv), handle in zip(requests, handles):
            got = list(batcher.stream(handle))
            solo = generate(
                params, jnp.asarray(ids[None]), jnp.asarray(im[None]),
                jnp.asarray(pv[None]), cfg, sampling, cache_len=64,
            )[0]
            np.testing.assert_array_equal(got, solo)

    def test_tp_paged_pools_sharded(self, setup):
        from vis_zephyr_tpu.serve.paged import PagedBatcher

        cfg, params = setup
        mesh = create_mesh(model=2)
        batcher = PagedBatcher(
            params, cfg, max_slots=2, cache_len=64, page_size=16,
            sampling=SamplingConfig(max_new_tokens=2), num_pages=16, mesh=mesh,
        )
        assert batcher.kp.sharding.spec[0] == "model", batcher.kp.sharding
        kernel = batcher.params["decoder"]["layers"]["attn"]["q"]["kernel"]
        assert "model" in tuple(kernel.sharding.spec)

    def test_tp_paged_rejects_indivisible_heads(self, setup):
        from vis_zephyr_tpu.serve.paged import PagedBatcher

        cfg, params = setup  # tiny Hkv=2; model=8 can't shard the pools
        mesh = create_mesh(model=8)
        with pytest.raises(ValueError, match="kv head"):
            PagedBatcher(
                params, cfg, max_slots=2, cache_len=64, page_size=16,
                sampling=SamplingConfig(max_new_tokens=2), mesh=mesh,
            )

    def test_tp_paged_speculative_matches(self, setup, rng):
        """Paged speculation under TP: multi-row verify rides the
        flash-structure kernel per pool shard (`_paged_attention_fa_tp`) —
        token-identical to single-device plain greedy."""
        from vis_zephyr_tpu.serve.paged import PagedBatcher

        cfg, params = setup
        mesh = create_mesh(model=2)
        sampling = SamplingConfig(max_new_tokens=10, temperature=0.0,
                                  eos_token_id=-1)
        ids = np.tile(rng.integers(5, 40, (5,)), 4)
        batcher = PagedBatcher(
            params, cfg, max_slots=2, cache_len=64, page_size=16,
            sampling=sampling, num_pages=32, mesh=mesh, lookahead=4,
        )
        h = batcher.submit(ids, None, None)
        batcher.run_until_drained()
        solo = generate(
            params, jnp.asarray(ids[None]), None, None, cfg, sampling,
            cache_len=64,
        )[0]
        np.testing.assert_array_equal(list(batcher.stream(h)), solo)

    def test_tp_paged_quant_speculative_matches(self, setup, rng):
        """int8 pools + TP + multi-row verify: scales shard with the pools
        through the quant FA wrapper."""
        from vis_zephyr_tpu.serve.paged import PagedBatcher

        cfg, params = setup
        mesh = create_mesh(model=2)
        sampling = SamplingConfig(max_new_tokens=8, temperature=0.0,
                                  eos_token_id=-1)
        ids = np.tile(rng.integers(5, 40, (6,)), 3)

        def run(lookahead):
            b = PagedBatcher(
                params, cfg, max_slots=2, cache_len=64, page_size=16,
                sampling=sampling, num_pages=32, mesh=mesh, kv_quant=True,
                lookahead=lookahead,
            )
            h = b.submit(ids, None, None)
            b.run_until_drained()
            return list(b.stream(h))

        assert run(4) == run(0)

    def test_tp_paged_chunked_prefill_matches(self, setup, rng):
        """Chunked prefill admission composes with TP paged decode."""
        from vis_zephyr_tpu.serve.paged import PagedBatcher

        cfg, params = setup
        mesh = create_mesh(model=2)
        sampling = SamplingConfig(max_new_tokens=5, temperature=0.0, eos_token_id=-1)
        batcher = PagedBatcher(
            params, cfg, max_slots=2, cache_len=64, page_size=16,
            sampling=sampling, num_pages=32, mesh=mesh, prefill_chunk=8,
        )
        ids, im, pv = make_request(cfg, rng, 21, with_image=False)
        h = batcher.submit(ids, im, pv)
        batcher.run_until_drained()
        solo = generate(
            params, jnp.asarray(ids[None]), None, None, cfg, sampling,
            cache_len=64,
        )[0]
        np.testing.assert_array_equal(list(batcher.stream(h)), solo)


class TestMeshSerializedEngine:
    """ADVICE r2 (high): ChatEngine with a mesh but NO batcher (serve.api/
    cli --tp N) runs generate_stream -> decode_step/decode_verify; those
    must route the cache write through the XLA scatter (pallas_cache=False)
    — the Pallas custom call can't be auto-partitioned over the kv-head-
    sharded cache."""

    def _engine(self, setup, mesh, **kw):
        from vis_zephyr_tpu.serve.engine import ChatEngine

        cfg, params = setup

        class _Tok:
            eos_token_id = -1  # never fires: deterministic token count

            def __call__(self, text):
                from types import SimpleNamespace

                ids = [1] + [5 + (ord(c) % 50) for c in text[:12]]
                return SimpleNamespace(input_ids=ids)

            def decode(self, ids, skip_special_tokens=True):
                return " ".join(str(i) for i in ids)

        return ChatEngine(params, cfg, _Tok(), temperature=0.0,
                          max_new_tokens=6, mesh=mesh, **kw)

    def test_serialized_tp_matches_single_device(self, setup):
        mesh = create_mesh(model=8)
        tp = self._engine(setup, mesh)
        solo = self._engine(setup, None)
        got_tp = tp.chat_text("s", "hello world")
        got_solo = solo.chat_text("s", "hello world")
        assert got_tp == got_solo and got_tp

    def test_serialized_tp_speculative_matches(self, setup):
        mesh = create_mesh(model=8)
        tp = self._engine(setup, mesh, lookahead=4)
        solo = self._engine(setup, None)
        got_tp = tp.chat_text("s", "abc abc abc")
        got_solo = solo.chat_text("s", "abc abc abc")
        assert got_tp == got_solo and got_tp


class TestMeshPagedQuantServing:
    """kv_quant under model-axis TP: int8 pools AND scale pools are
    kv-head-sharded; each shard quantizes/dequantizes its own heads."""

    def test_tp_paged_quant_matches_single_device(self, setup, rng):
        from vis_zephyr_tpu.serve.paged import PagedBatcher

        cfg, params = setup
        mesh = create_mesh(model=2)
        sampling = SamplingConfig(max_new_tokens=6, temperature=0.0, eos_token_id=-1)
        batcher = PagedBatcher(
            params, cfg, max_slots=4, cache_len=64, page_size=16,
            sampling=sampling, num_pages=32, mesh=mesh, kv_quant=True,
        )
        requests = [make_request(cfg, rng, T, with_image=True) for T in (5, 8)]
        handles = [batcher.submit(ids, im, pv) for ids, im, pv in requests]
        batcher.run_until_drained()

        for (ids, im, pv), handle in zip(requests, handles):
            got = list(batcher.stream(handle))
            solo = generate(
                params, jnp.asarray(ids[None]), jnp.asarray(im[None]),
                jnp.asarray(pv[None]), cfg, sampling, cache_len=64,
            )[0]
            np.testing.assert_array_equal(got, solo)

    def test_tp_paged_quant_scale_pools_sharded(self, setup):
        from vis_zephyr_tpu.serve.paged import PagedBatcher

        cfg, params = setup
        mesh = create_mesh(model=2)
        batcher = PagedBatcher(
            params, cfg, max_slots=2, cache_len=32, page_size=16,
            sampling=SamplingConfig(max_new_tokens=2), num_pages=16, mesh=mesh,
            kv_quant=True,
        )
        assert batcher.kp.dtype == jnp.int8
        for pool in (batcher.kp, batcher.ksp, batcher.vsp):
            shard_shape = pool.addressable_shards[0].data.shape
            assert shard_shape[0] == pool.shape[0] // 2  # kv heads split
