"""Weight-only int8 quantization tests."""

import jax
import jax.numpy as jnp
import numpy as np

from vis_zephyr_tpu.config import DecoderConfig
from vis_zephyr_tpu.models.mistral import embed, init_mistral, mistral_forward
from vis_zephyr_tpu.ops.quant import maybe_dequant, quantize_decoder_layers, quantize_kernel


def test_quantize_roundtrip_error_bounded(rng):
    w = rng.standard_normal((4, 32, 16)).astype(np.float32)
    q = quantize_kernel(jnp.asarray(w))
    assert q["kernel_q"].dtype == jnp.int8
    assert q["scale"].shape == (4, 1, 16)
    deq = np.asarray(maybe_dequant(q, jnp.float32))
    err = np.abs(deq - w)
    # Max error is half a quantization step per channel.
    step = np.asarray(q["scale"])
    assert (err <= 0.51 * step).all()


def test_quantized_decoder_close_to_fp(rng):
    cfg = DecoderConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128, num_layers=2,
        num_heads=4, num_kv_heads=2, head_dim=16, sliding_window=None,
    )
    params = init_mistral(cfg, jax.random.PRNGKey(0))
    qparams = quantize_decoder_layers(params)

    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (1, 8)))
    pos = jnp.arange(8)[None]
    ref_logits, _ = mistral_forward(params, embed(params, ids), cfg, pos)
    q_logits, _ = mistral_forward(qparams, embed(qparams, ids), cfg, pos)

    ref = np.asarray(ref_logits)
    got = np.asarray(q_logits)
    # int8 weight-only: logits track closely; argmax agrees on ≥90% of steps.
    rel = np.abs(got - ref) / (np.abs(ref).max() + 1e-6)
    assert rel.mean() < 0.02
    agree = (got.argmax(-1) == ref.argmax(-1)).mean()
    assert agree >= 0.75, agree


class TestInt4:
    def test_int4_roundtrip_error_bounded(self, rng):
        from vis_zephyr_tpu.ops.quant import quantize_kernel_int4

        w = rng.standard_normal((256, 48)).astype(np.float32)
        q = quantize_kernel_int4(jnp.asarray(w), group=64)
        assert q["kernel_q4"].dtype == jnp.int8
        assert q["kernel_q4"].shape == (128, 48)
        assert q["scale4"].shape == (4, 48)
        deq = np.asarray(maybe_dequant(q, jnp.float32))
        # Max error: half a step, except clipped values (|w| = absmax maps
        # to ±7 exactly, so clipping never loses more than a half step).
        step = np.repeat(np.asarray(q["scale4"]), 64, axis=0)
        assert (np.abs(deq - w) <= 0.51 * step).all()

    def test_int4_packing_layout(self):
        """Half-split group packing: low nibbles carry the group's first
        half of rows, high nibbles the second half."""
        from vis_zephyr_tpu.ops.quant import quantize_kernel_int4, unpack_int4

        K, N, group = 8, 4, 4
        # Integer codes in [-7, 7] with ±7 present per group → scale = 1 and
        # the roundtrip is exact, making layout errors loud.
        rng = np.random.default_rng(0)
        w = rng.integers(-7, 8, (K, N)).astype(np.float32)
        w[0, :] = 7  # pin absmax in each group
        w[4, :] = -7
        q = quantize_kernel_int4(jnp.asarray(w), group=group)
        unpacked = np.asarray(unpack_int4(q["kernel_q4"], K // group))
        np.testing.assert_array_equal(unpacked.astype(np.float32), w)
        # Byte layout: packed row i of group g = (low: row g*4+i,
        # high: row g*4+2+i).
        packed = np.asarray(q["kernel_q4"])
        assert packed.shape == (4, N)
        expect_byte = (int(w[0, 0]) & 0xF) | ((int(w[2, 0]) & 0xF) << 4)
        assert (int(packed[0, 0]) & 0xFF) == expect_byte

    def test_int4_stacked_layers(self, rng):
        from vis_zephyr_tpu.ops.quant import quantize_kernel_int4

        w = rng.standard_normal((3, 128, 32)).astype(np.float32)
        q = quantize_kernel_int4(jnp.asarray(w), group=64)
        assert q["kernel_q4"].shape == (3, 64, 32)
        assert q["scale4"].shape == (3, 2, 32)
        deq = np.asarray(maybe_dequant(q, jnp.float32))
        assert deq.shape == w.shape
        step = np.repeat(np.asarray(q["scale4"]), 64, axis=1)
        assert (np.abs(deq - w) <= 0.51 * step).all()

    def test_qdot_int4_matches_dequant_einsum(self, rng):
        from vis_zephyr_tpu.ops.quant import quantize_kernel_int4
        from vis_zephyr_tpu.ops.quant_matmul import qdot

        w = rng.standard_normal((256, 64)).astype(np.float32)
        x = rng.standard_normal((2, 5, 256)).astype(np.float32)
        q = quantize_kernel_int4(jnp.asarray(w), group=128)
        got = np.asarray(qdot(jnp.asarray(x), q))
        expect = x @ np.asarray(maybe_dequant(q, jnp.float32))
        np.testing.assert_allclose(got, expect, rtol=1e-4, atol=1e-4)

    def test_int4_decoder_forward_close_to_fp(self, rng):
        cfg = DecoderConfig(
            vocab_size=128, hidden_size=64, intermediate_size=128, num_layers=2,
            num_heads=4, num_kv_heads=2, head_dim=16, sliding_window=None,
        )
        params = init_mistral(cfg, jax.random.PRNGKey(0))
        qparams = quantize_decoder_layers(params, bits=4, group=32)

        ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (1, 8)))
        pos = jnp.arange(8)[None]
        ref_logits, _ = mistral_forward(params, embed(params, ids), cfg, pos)
        q_logits, _ = mistral_forward(qparams, embed(qparams, ids), cfg, pos)
        ref, got = np.asarray(ref_logits), np.asarray(q_logits)
        rel = np.abs(got - ref) / (np.abs(ref).max() + 1e-6)
        assert rel.mean() < 0.05
        agree = (got.argmax(-1) == ref.argmax(-1)).mean()
        assert agree >= 0.6, agree

    def test_fuse_decoder_layers_int4(self, rng):
        from vis_zephyr_tpu.models.mistral import fuse_decoder_layers

        cfg = DecoderConfig(
            vocab_size=128, hidden_size=64, intermediate_size=128, num_layers=2,
            num_heads=4, num_kv_heads=2, head_dim=16, sliding_window=None,
        )
        params = init_mistral(cfg, jax.random.PRNGKey(0))
        qparams = quantize_decoder_layers(params, bits=4, group=32)
        fused = fuse_decoder_layers(qparams)
        assert "kernel_q4" in fused["layers"]["attn"]["qkv"]

        ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (1, 6)))
        pos = jnp.arange(6)[None]
        a, _ = mistral_forward(qparams, embed(qparams, ids), cfg, pos)
        b, _ = mistral_forward(fused, embed(fused, ids), cfg, pos)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-2, atol=2e-2)

    def test_pallas_int4_matmul_interpret(self, rng):
        """Pallas int4 kernel vs the dequant oracle (interpret mode on CPU)."""
        from vis_zephyr_tpu.ops.quant import quantize_kernel_int4
        from vis_zephyr_tpu.ops.quant_matmul import quantized_matmul_int4

        w = rng.standard_normal((256, 128)).astype(np.float32)
        x = rng.standard_normal((4, 256)).astype(np.float32)
        q = quantize_kernel_int4(jnp.asarray(w), group=128)
        expect = x @ np.asarray(maybe_dequant(q, jnp.float32))
        got = quantized_matmul_int4(
            jnp.asarray(x), q["kernel_q4"], q["scale4"],
            out_dtype=jnp.float32, interpret=True,
        )
        # Kernel computes in bf16 (the production dtype); oracle is f32.
        scale = np.abs(expect).max()
        np.testing.assert_allclose(
            np.asarray(got) / scale, expect / scale, atol=8e-3
        )

    def test_pallas_int4_matmul_m128(self, rng):
        """M=128 (the B=128 decode batch — the m-cap the serving path
        relies on) through the same interpret-mode oracle."""
        from vis_zephyr_tpu.ops.quant import quantize_kernel_int4
        from vis_zephyr_tpu.ops.quant_matmul import quantized_matmul_int4

        w = rng.standard_normal((256, 256)).astype(np.float32)
        x = rng.standard_normal((128, 256)).astype(np.float32)
        q = quantize_kernel_int4(jnp.asarray(w), group=128)
        expect = x @ np.asarray(maybe_dequant(q, jnp.float32))
        got = quantized_matmul_int4(
            jnp.asarray(x), q["kernel_q4"], q["scale4"],
            out_dtype=jnp.float32, interpret=True,
        )
        scale = np.abs(expect).max()
        np.testing.assert_allclose(
            np.asarray(got) / scale, expect / scale, atol=8e-3
        )
