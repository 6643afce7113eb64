"""In-place dense KV-cache row writes (Pallas).

The dense decode path (`models/mistral.py` cache mode) appends each
step's K/V with an XLA scatter per layer (`ck.at[i, b, slot].set(k)`).
On the head-major paged pools the equivalent scatter cost ~20 ms/step at
B=32 (leading-dim strides serialize the row writes) and the Pallas
replacement (`ops/paged_attention.paged_kv_update`) recovered all of it.
Measured on the DENSE layout the story differs: [L, B, S, Hkv, D] keeps
each row contiguous and XLA's scatter is already efficient — this kernel
matches it (B=16 decode 18.44 ms/step either way, v5e) rather than
beating it. It is kept as the default because it is exact vs the
scatter, pins the buffers via `input_output_aliases` (no reliance on
XLA's scatter-aliasing heuristics), and gives the multi-token verify
append an explicit row-write path.

Layout: grid (B, T), each cell fully overwrites one [Hkv, D] row block
at (layer, b, lengths[b] + t) — no copy, no read-modify-write (row
blocks are whole). Padded trailing tokens are written like the scatter
wrote them: their rows hold garbage that the attention mask already
excludes and the next append overwrites.

Reference equivalent: HF's `past_key_values` concat (`torch.cat` per
layer, reallocating), reference `vis_zephyr/model/language_model/
vis_zephyr.py` generate path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _update_kernel(layer_ref, lengths_ref, k_ref, v_ref, kold_ref, vold_ref,
                   kout_ref, vout_ref):
    del layer_ref, lengths_ref, kold_ref, vold_ref
    kout_ref[...] = k_ref[...][:, :, None]
    vout_ref[...] = v_ref[...][:, :, None]


@functools.partial(jax.jit, static_argnames=("interpret",),
                   donate_argnums=(0, 1))
def dense_cache_update(
    ck: jnp.ndarray,       # [L, B, S, Hkv, D] (donated, updated in place)
    cv: jnp.ndarray,
    k: jnp.ndarray,        # [B, T, Hkv, D] — the new rows (T=1 for decode)
    v: jnp.ndarray,
    lengths: jnp.ndarray,  # [B] int32 — first slot to write per sequence
    layer,                 # int32 scalar — which layer's segment to write
    interpret=None,
) -> tuple:
    """Write k/v at cache rows [layer, b, lengths[b] + t] in place."""
    L, Bc, S, Hkv, D = ck.shape
    B, T, _, _ = k.shape
    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    layer_arr = jnp.asarray(layer, jnp.int32).reshape(1)
    row_block = pl.BlockSpec(
        (1, 1, 1, Hkv, D),
        # Clamp keeps an (caller-prevented) overflow inside the buffer
        # instead of undefined behaviour.
        lambda b, t, lyr, ln: (lyr[0], b, jnp.minimum(ln[b] + t, S - 1), 0, 0),
    )
    new_block = pl.BlockSpec((1, 1, Hkv, D), lambda b, t, lyr, ln: (b, t, 0, 0))
    return pl.pallas_call(
        _update_kernel,
        out_shape=(jax.ShapeDtypeStruct(ck.shape, ck.dtype),
                   jax.ShapeDtypeStruct(cv.shape, cv.dtype)),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,  # layer, lengths
            grid=(B, T),
            in_specs=[new_block, new_block, row_block, row_block],
            out_specs=[row_block, row_block],
        ),
        # Flattened-arg indices including scalar-prefetch operands:
        # (layer, lengths, k, v, ck, cv) → ck = 4, cv = 5.
        input_output_aliases={4: 0, 5: 1},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(layer_arr, lengths.astype(jnp.int32), k.astype(ck.dtype),
      v.astype(cv.dtype), ck, cv)
