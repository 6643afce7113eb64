"""Int8 Q-Former inference quantization stays close to the bf16 path."""

import jax
import jax.numpy as jnp
import numpy as np

from vis_zephyr_tpu.config import ProjectorConfig
from vis_zephyr_tpu.models.qformer import init_qformer, qformer_forward
from vis_zephyr_tpu.ops.quant import quantize_qformer


def test_quantized_qformer_close(rng):
    cfg = ProjectorConfig(
        num_queries=8, hidden_size=32, visual_hidden_size=48, num_blocks=2,
        num_heads=4, ffn_dim=64,
    )
    params = init_qformer(cfg, jax.random.PRNGKey(0))
    qparams = quantize_qformer(params)
    assert "kernel_q" in qparams["blocks"]["cross_attn"]["k"]
    assert "bias" in qparams["blocks"]["cross_attn"]["k"]

    visual = jnp.asarray(rng.standard_normal((2, 12, cfg.visual_hidden_size)), jnp.float32)
    text = jnp.asarray(rng.standard_normal((2, 5, cfg.hidden_size)), jnp.float32)
    ref = np.asarray(qformer_forward(params, visual, cfg, text_embeddings=text))
    got = np.asarray(qformer_forward(qparams, visual, cfg, text_embeddings=text))
    rel = np.abs(got - ref) / (np.abs(ref).max() + 1e-9)
    assert rel.mean() < 0.02, rel.mean()


def test_quantized_mlp_projector_close(rng):
    """ADVICE r2 (medium): --load-8bit on an mlp2x_gelu checkpoint must
    quantize {fc1, fc2} instead of KeyError-ing on the absent "blocks"."""
    import dataclasses

    from vis_zephyr_tpu.config import VisZephyrConfig, tiny_config
    from vis_zephyr_tpu.models.projector import init_mlp_projector, mlp_projector_forward

    cfg = dataclasses.replace(
        tiny_config(), mm_projector_type="mlp2x_gelu",
        mm_patch_merge_type="spatial_unpad",
    )
    params = init_mlp_projector(cfg, jax.random.PRNGKey(0))
    qparams = quantize_qformer(params)
    assert "kernel_q" in qparams["fc1"] and "kernel_q" in qparams["fc2"]
    assert "bias" in qparams["fc1"]
    assert "image_newline" in qparams  # untouched

    visual = jnp.asarray(
        rng.standard_normal((2, 12, cfg.projector.visual_hidden_size)), jnp.float32
    )
    ref = np.asarray(mlp_projector_forward(params, visual))
    got = np.asarray(mlp_projector_forward(qparams, visual))
    rel = np.abs(got - ref) / (np.abs(ref).max() + 1e-9)
    assert rel.mean() < 0.02, rel.mean()
