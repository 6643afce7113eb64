"""Parameter/activation sharding rules.

Rules are keyed on parameter *path suffixes* and express where the model's
natural parallel dimensions live:

- `model` axis (tensor parallel): attention heads and FFN hidden columns —
  column-parallel on the input projection, row-parallel on the output
  projection, so each layer needs exactly one psum on its output (XLA
  inserts it from the specs).
- `fsdp` axis (ZeRO-3 equivalent): every large tensor additionally sharded
  on a complementary dimension; XLA all-gathers just-in-time per layer and
  reduce-scatters gradients.

A spec is only applied when the dimension divides evenly by the mesh axis
size; otherwise that axis entry degrades to replication — so the same rules
serve the 7B config and tiny test configs.
"""

from __future__ import annotations

import re
from typing import Dict, Optional, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


# (path regex, spec builder) — first match wins. Spec entries name the
# logical role of each dim: None, "model", "fsdp", or ("fsdp", "model").
# Paths are '/'-joined dict keys, e.g. "decoder/layers/attn/q/kernel".
_RULES: Tuple[Tuple[str, Tuple], ...] = (
    # Decoder (stacked [L, ...]).
    (r"decoder/layers/attn/(q|k|v|qkv)/(kernel|kernel_q)$", (None, "fsdp", "model")),
    (r"decoder/layers/mlp/gate_up/(kernel|kernel_q)$", (None, "fsdp", "model")),
    (r"decoder/layers/attn/(q|k|v)/kernel$", (None, "fsdp", "model")),
    (r"decoder/layers/attn/out/kernel$", (None, "model", "fsdp")),
    (r"decoder/layers/mlp/(gate|up)/kernel$", (None, "fsdp", "model")),
    (r"decoder/layers/mlp/down/kernel$", (None, "model", "fsdp")),
    (r"decoder/layers/.*ln/scale$", (None, None)),
    (r"decoder/embed_tokens$", ("fsdp", "model")),
    (r"decoder/lm_head/kernel$", ("fsdp", "model")),
    (r"decoder/final_ln/scale$", (None,)),
    # Q-Former (stacked [L, ...] blocks + top-level tensors).
    (r"projector/blocks/(self_attn|cross_attn)/(q|k|v)/kernel$", (None, "fsdp", "model")),
    (r"projector/blocks/(self_attn|cross_attn)/out/kernel$", (None, "model", "fsdp")),
    (r"projector/blocks/(self_attn|cross_attn)/(q|k|v)/bias$", (None, "model")),
    (r"projector/blocks/(self_attn|cross_attn)/out/bias$", (None, None)),
    (r"projector/blocks/fc1/kernel$", (None, "fsdp", "model")),
    (r"projector/blocks/fc1/bias$", (None, "model")),
    (r"projector/blocks/fc2/kernel$", (None, "model", "fsdp")),
    (r"projector/blocks/fc2/bias$", (None, None)),
    (r"projector/queries$", (None, None)),
    # mlp2x_gelu projector: column-parallel in, row-parallel out.
    (r"projector/fc1/kernel$", ("fsdp", "model")),
    (r"projector/fc1/bias$", ("model",)),
    (r"projector/fc2/kernel$", ("model", "fsdp")),
    (r"projector/fc2/bias$", (None,)),
    (r"projector/image_newline$", (None,)),
    # Vision tower (stacked [L, ...]).
    (r"vision/layers/attn/(q|k|v)/kernel$", (None, "fsdp", "model")),
    (r"vision/layers/attn/out/kernel$", (None, "model", "fsdp")),
    (r"vision/layers/attn/(q|k|v)/bias$", (None, "model")),
    (r"vision/layers/fc1/kernel$", (None, "fsdp", "model")),
    (r"vision/layers/fc1/bias$", (None, "model")),
    (r"vision/layers/fc2/kernel$", (None, "model", "fsdp")),
    (r"vision/embeddings/(patch_kernel|position_embedding)$", (None, "fsdp")),
)


def _path_str(path) -> str:
    parts = []
    for p in path:
        parts.append(str(getattr(p, "key", getattr(p, "idx", p))))
    return "/".join(parts)


def _fits(spec_names, shape, mesh: Mesh) -> P:
    """Degrade axis entries that don't divide the dimension evenly."""
    entries = []
    for dim, name in zip(shape, spec_names):
        if name is None:
            entries.append(None)
            continue
        names = (name,) if isinstance(name, str) else tuple(name)
        size = 1
        for n in names:
            size *= mesh.shape[n]
        entries.append(name if size > 1 and dim % size == 0 else None)
    return P(*entries)


def spec_for(path_str: str, shape, mesh: Mesh) -> P:
    for pattern, spec in _RULES:
        if re.search(pattern, path_str):
            if len(spec) != len(shape):
                break  # structural mismatch → replicate
            return _fits(spec, shape, mesh)
    # Default: FSDP-shard the largest dimension that divides evenly.
    if mesh.shape["fsdp"] > 1 and shape:
        dims = sorted(range(len(shape)), key=lambda i: -shape[i])
        for i in dims:
            if shape[i] % mesh.shape["fsdp"] == 0 and shape[i] >= mesh.shape["fsdp"] * 8:
                entries = [None] * len(shape)
                entries[i] = "fsdp"
                return P(*entries)
    return P()


def param_specs(params, mesh: Mesh):
    """Pytree of PartitionSpec mirroring `params`."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: spec_for(_path_str(path), leaf.shape, mesh), params
    )


def shard_params(params, mesh: Mesh):
    """Place a param pytree onto the mesh per `param_specs`."""
    specs = param_specs(params, mesh)
    return jax.tree_util.tree_map(
        lambda leaf, spec: jax.device_put(leaf, NamedSharding(mesh, spec)), params, specs
    )


def _axis_fits(mesh: Mesh, axis: str, dim: int) -> bool:
    return mesh.shape[axis] > 1 and dim % mesh.shape[axis] == 0


def shard_kv_cache(cache: Dict, mesh: Mesh) -> Dict:
    """Place a dense decode cache {"k","v" [L,B,S,Hkv,D], "length"} on the
    mesh: KV heads ride the model (TP) axis — attention is head-local, so
    the cache never moves over ICI. Degrades to replication when Hkv
    doesn't divide the axis (tiny configs)."""
    Hkv = cache["k"].shape[3]
    kv = P(None, None, None, "model" if _axis_fits(mesh, "model", Hkv) else None, None)
    return {
        "k": jax.device_put(cache["k"], NamedSharding(mesh, kv)),
        "v": jax.device_put(cache["v"], NamedSharding(mesh, kv)),
        "length": jax.device_put(cache["length"], NamedSharding(mesh, P())),
    }


def replicated(x, mesh: Mesh):
    return jax.device_put(x, NamedSharding(mesh, P()))


def constrain_batch_sharded(x):
    """Inside jit under a data-parallel mesh, pin dim 0 to the batch axes.

    Without this, XLA may pick an incompatible sharding for a consumer of a
    gather-heavy activation (the spliced embeddings) and fall back to
    replicate-then-reshard — the SPMD 'involuntary full rematerialization'
    warning. No-op when tracing with no mesh, when the mesh has no
    batch-parallel axes (TP-only serving), or when the batch doesn't divide.
    """
    mesh = jax.sharding.get_abstract_mesh()
    if mesh is None or mesh.empty:
        return x
    axes = tuple(
        a for a in ("dcn", "data", "fsdp") if a in mesh.shape and mesh.shape[a] > 1
    )
    if not axes:
        return x
    n = 1
    for a in axes:
        n *= mesh.shape[a]
    if x.ndim == 0 or x.shape[0] % n:
        return x
    return jax.lax.with_sharding_constraint(x, P(axes, *([None] * (x.ndim - 1))))


def batch_spec(mesh: Mesh) -> P:
    """Batch dimension spans every data-parallel axis (dcn + data + fsdp)."""
    axes = tuple(
        a for a in ("dcn", "data", "fsdp") if a in mesh.shape and mesh.shape[a] > 1
    )
    return P(axes if axes else None)


def shard_batch(batch, mesh: Mesh):
    spec = batch_spec(mesh)
    return jax.tree_util.tree_map(
        lambda leaf: jax.device_put(
            leaf, NamedSharding(mesh, P(*(list(spec) + [None] * (leaf.ndim - 1))))
        ),
        batch,
    )
