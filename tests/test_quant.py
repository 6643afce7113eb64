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
