"""Model stack: CLIP ViT vision tower, multi-layer fusion, text-conditioned
Q-Former projector, Mistral/Zephyr decoder, and the fused multimodal model.

All models are pure functions over explicit parameter pytrees (nested dicts
of jnp arrays): `init(config, key) -> params` and
`forward(params, inputs, config) -> outputs`. This keeps every forward pass
trivially jittable, shardable via `jax.sharding` path rules, and easy to
populate from HF checkpoints (`vis_zephyr_tpu.models.hf_convert`).
"""

from .clip_vit import clip_vit_forward, init_clip_vit
from .fusion import dense_channel_fusion
from .qformer import init_qformer, qformer_forward
