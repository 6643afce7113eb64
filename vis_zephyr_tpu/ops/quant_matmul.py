"""Pallas TPU kernel: fused int8-weight dequantize + matmul.

Why: XLA lowers `x @ (w_int8 * scale)` by materializing the dequantized
bf16 weights in HBM — for Zephyr-7B decode that turns ~7.5 GB/token of
weight traffic into ~35 GB/token (measured 40.8 ms/token on v5e). This
kernel reads int8 tiles HBM→VMEM, upconverts in VMEM, and feeds the MXU —
weight bytes cross HBM exactly once, at int8 width.

Contract: `quantized_matmul(x [M, K] bf16/f32, wq [K, N] int8,
scale [1, N] f32) -> [M, N]`, equal to `x @ (wq * scale)`.

Tiling: grid (N tiles, K tiles); K is the sequential reduction dimension
(accumulated in an f32 VMEM scratch, scale applied on the last K step —
per-output-column scales commute with the K reduction). M is small in
decode (1-16 tokens) and stays un-tiled.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, w_ref, scale_ref, out_ref, acc_ref):
    @pl.when(pl.program_id(1) == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    # int8 → bf16 in VMEM, straight into the MXU.
    w = w_ref[...].astype(jnp.bfloat16)
    acc_ref[...] += jnp.dot(
        x_ref[...].astype(jnp.bfloat16), w, preferred_element_type=jnp.float32
    )

    @pl.when(pl.program_id(1) == pl.num_programs(1) - 1)
    def _finish():
        out_ref[...] = (acc_ref[...] * scale_ref[...].astype(jnp.float32)).astype(
            out_ref.dtype
        )


@functools.partial(jax.jit, static_argnames=("block_n", "block_k", "out_dtype"))
def quantized_matmul(
    x: jnp.ndarray,
    wq: jnp.ndarray,
    scale: jnp.ndarray,
    block_n: int = 512,
    block_k: int = 512,
    out_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """x [M, K] @ dequant(wq [K, N], scale [1, N]) → [M, N]."""
    M, K = x.shape
    K2, N = wq.shape
    assert K == K2, (x.shape, wq.shape)
    scale = scale.reshape(1, N)

    block_k = min(block_k, K)
    block_n = min(block_n, N)
    if K % block_k or N % block_n:
        raise ValueError(f"K={K}, N={N} must tile by ({block_k}, {block_n})")

    # Pad M up to the sublane quantum so tiny decode batches still map.
    M_pad = max(8, ((M + 7) // 8) * 8)
    if M_pad != M:
        x = jnp.pad(x, ((0, M_pad - M), (0, 0)))

    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((M_pad, N), out_dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(N // block_n, K // block_k),
            in_specs=[
                pl.BlockSpec((M_pad, block_k), lambda j, k: (0, k)),
                pl.BlockSpec((block_k, block_n), lambda j, k: (k, j)),
                pl.BlockSpec((1, block_n), lambda j, k: (0, j)),
            ],
            out_specs=pl.BlockSpec((M_pad, block_n), lambda j, k: (0, j)),
            scratch_shapes=[pltpu.VMEM((M_pad, block_n), jnp.float32)],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * M_pad * K * N,
            bytes_accessed=M_pad * K * 2 + K * N + M_pad * N * 2,
            transcendentals=0,
        ),
    )(x, wq, scale)
    return out[:M] if M_pad != M else out


def qdot(x: jnp.ndarray, p: dict, use_pallas: bool = True) -> jnp.ndarray:
    """Dense apply for raw or quantized dense params, with optional LoRA.

    `x`: [..., K]; `p`: {"kernel": [K, N]} or {"kernel_q", "scale"}, plus
    optional LoRA leaves {"lora_a": [K, r], "lora_b": [r, N],
    "lora_scale": scalar} whose contribution `(x@A)@B * scale` is added
    (stage-2 adapters, reference peft wrap `train/train.py:775-787`).
    Uses the Pallas kernel on TPU backends when the shapes tile; otherwise
    falls back to dequant + einsum (CPU tests, odd shapes).
    """
    out = _base_dot(x, p, use_pallas)
    if "lora_a" in p:
        delta = jnp.einsum("...k,kr->...r", x, p["lora_a"].astype(x.dtype))
        delta = jnp.einsum("...r,rn->...n", delta, p["lora_b"].astype(x.dtype))
        out = out + delta * p["lora_scale"].astype(x.dtype)
    return out


def _base_dot(x: jnp.ndarray, p: dict, use_pallas: bool) -> jnp.ndarray:
    if "kernel_q" not in p:
        return jnp.einsum("...k,kn->...n", x, p["kernel"])

    wq, scale = p["kernel_q"], p["scale"]
    K, N = wq.shape[-2:]
    # Measured on v5e: XLA fuses the int8→bf16 convert into the dot (weights
    # cross HBM once at int8 width, ~350 GB/s effective); the Pallas kernel
    # currently reaches ~270 GB/s, so it is opt-in until it wins.
    pallas_ok = (
        use_pallas
        and _PALLAS_QMM_ENABLED
        and jax.default_backend() not in ("cpu",)
        and K % 256 == 0
        and N % 256 == 0
    )
    if pallas_ok:
        lead = x.shape[:-1]
        flat = x.reshape(-1, K)
        bn = 512 if N % 512 == 0 else 256
        bk = 512 if K % 512 == 0 else 256
        out = quantized_matmul(flat, wq, scale.reshape(1, N), block_n=bn, block_k=bk,
                               out_dtype=x.dtype)
        return out.reshape(*lead, N)
    w = wq.astype(x.dtype) * scale.astype(x.dtype)
    return jnp.einsum("...k,kn->...n", x, w)


import os as _os

_PALLAS_QMM_ENABLED = _os.environ.get("VZT_PALLAS_QMM", "0") == "1"
