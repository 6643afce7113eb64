"""vis_zephyr_tpu — a TPU-native (JAX/XLA/Pallas/pjit) multimodal LLM framework.

Re-implements the capabilities of the Vision-Zephyr reference (a
LLaVA-/ViP-LLaVA-style stack: frozen CLIP ViT-L/14-336 vision tower with
multi-layer feature fusion, a text-conditioned Q-Former projector, and the
Zephyr-7B-β Mistral decoder) as an idiomatic TPU framework:

- the compute path is pure-functional JAX compiled by XLA, with Pallas
  kernels for the hot ops (flash attention, fused image preprocessing),
- parallelism is expressed as `jax.sharding` specs over named device meshes
  (data / fsdp / model axes) rather than NCCL wrappers,
- training uses pjit + FSDP-style parameter sharding in place of DeepSpeed
  ZeRO, and orbax for checkpoints,
- inference runs as a single XLA program: on-device anyres preprocessing →
  vision encode → projector → prefill → KV-cache decode.

Reference surface being matched: `vis_zephyr` @ /root/reference (see
SURVEY.md for the inventory; reference citations in docstrings are
`file:line` into that tree).
"""

__version__ = "0.1.0"

import os as _os

# First-class platform selection for every CLI surface (train/serve/eval/
# bench): VZT_PLATFORM=cpu|tpu|... wins over any sitecustomize that
# force-registers a backend via jax.config AFTER env vars are read (the
# jax.config.update below outranks both the env var and the hook as long as
# it runs before backend instantiation — package import time qualifies).
if _os.environ.get("VZT_PLATFORM"):
    import jax as _jax

    _jax.config.update("jax_platforms", _os.environ["VZT_PLATFORM"])
