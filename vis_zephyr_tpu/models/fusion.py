"""Dense channel-integration fusion of multi-layer ViT features.

Behavioral parity: reference
`vis_zephyr/model/gating_fusion/gating_fusion.py:13-50`
(`DenseChannelIntegrationFusion`): the trailing 20 intermediate layers are
split into 4 contiguous groups of 5, each group is mean-pooled across
layers, and the 4 group means plus the final layer are concatenated on the
channel dimension: 21 × [B, T, C] → [B, T, 5C].

Implemented as one reshape + mean + concat over a stacked layer axis — a
pure XLA fusion, no parameters.
"""

from __future__ import annotations

import jax.numpy as jnp


def dense_channel_fusion(stacked_features: jnp.ndarray, num_groups: int = 4) -> jnp.ndarray:
    """Fuse stacked per-layer features.

    Args:
      stacked_features: [S, B, T, C] with S = num_groups * layers_per_group + 1;
        the last entry is the final layer, the rest are intermediates
        (oldest first).
      num_groups: number of contiguous layer groups to mean-pool.

    Returns:
      [B, T, (num_groups + 1) * C]
    """
    S, B, T, C = stacked_features.shape
    num_intermediate = S - 1
    if num_intermediate % num_groups != 0:
        raise ValueError(
            f"{num_intermediate} intermediate layers not divisible by {num_groups} groups"
        )
    per_group = num_intermediate // num_groups
    intermediates = stacked_features[:-1].reshape(num_groups, per_group, B, T, C)
    group_means = jnp.mean(intermediates, axis=1)            # [G, B, T, C]
    parts = jnp.concatenate([group_means, stacked_features[-1:]], axis=0)  # [G+1, B, T, C]
    # Channel-concat in layer order: [B, T, (G+1)*C].
    return jnp.transpose(parts, (1, 2, 0, 3)).reshape(B, T, (num_groups + 1) * C)
