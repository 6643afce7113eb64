"""Pallas TPU kernel: fused int8-weight dequantize + matmul.

Why: XLA lowers `x @ (w_int8 * scale)` well (it fuses the convert into the
dot — measured ~350 GB/s of int8 weight reads on v5e), but that still
leaves >50% of HBM bandwidth on the table for the decode hot loop, which is
purely weight-bandwidth-bound. This kernel streams *contiguous* full-width
row panels of the int8 weight matrix (one DMA per K-tile, no small strided
transfers), upconverts in VMEM, and feeds the MXU; the f32 accumulator
[M, N] lives in VMEM across K tiles and the per-output-channel scale is
applied once at the end.

Contract: `quantized_matmul(x [M, K], wq [K, N] int8, scale [1, N] f32)
== x @ (wq * scale)`. M is small (decode: 1-16 rows).

Grid: (K / block_k,) — sequential reduction; each step reads an
x tile [M, block_k] and a weight panel [block_k, N].
VMEM @ block_k=512, N=14336, M=8: panel 7.3 MB (double-buffered by the
pipeline) + acc 0.46 MB — well inside v5e's 128 MB VMEM.
"""

from __future__ import annotations

import functools
import os as _os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_PALLAS_QMM_ENABLED = _os.environ.get("VZT_PALLAS_QMM", "0") == "1"


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


@functools.partial(jax.jit, static_argnames=("block_k", "block_n", "out_dtype"))
def quantized_matmul(
    x: jnp.ndarray,
    wq: jnp.ndarray,
    scale: jnp.ndarray,
    block_k: int = 512,
    block_n: int = 2048,
    out_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """x [M, K] @ dequant(wq [K, N], scale [1, N]) → [M, N].

    Grid (N/block_n parallel, K/block_k sequential reduction) — the same
    structure as the int4 kernel, which measures faster than both the old
    full-N sequential-K layout (270 GB/s) and XLA's fused dequant-dot
    (~357 GB/s): smaller [block_k, block_n] panels pipeline DMAs across
    grid steps instead of serializing on one huge panel per step."""
    M, K = x.shape
    K2, N = wq.shape
    assert K == K2, (x.shape, wq.shape)
    scale = scale.reshape(1, N)

    block_k = min(block_k, K)
    if K % block_k:
        raise ValueError(f"K={K} must tile by block_k={block_k}")
    if N % 128 == 0 and N % block_n:
        block_n = next(d * 128 for d in range(N // 128, 0, -1)
                       if N % (d * 128) == 0)
    block_n = min(block_n, N)
    if N % block_n:
        # The grid would silently drop the last N % block_n columns.
        raise ValueError(f"N={N} must tile by block_n={block_n} "
                         f"(lane-aligned N, or N small enough for one block)")

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
                pl.BlockSpec((M_pad, block_k), lambda n, k: (0, k)),
                pl.BlockSpec((block_k, block_n), lambda n, k: (k, n)),
                pl.BlockSpec((1, block_n), lambda n, k: (0, n)),
            ],
            out_specs=pl.BlockSpec((M_pad, block_n), lambda n, k: (0, n)),
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


def _make_kernel_int4(group: int, gb: int):
    """Kernel over `gb` scale groups per grid step. Per group: unpack the
    half-split nibbles (low nibble = first half of the group's rows —
    `quant.quantize_kernel_int4` layout) with int32 shifts (Mosaic cannot
    legalize int8 shifts), dot each nibble half against its x slice (no
    sublane concat), and apply the group scale to the [M, N] dot RESULT —
    16× fewer multiplies than scaling the weights. Measured on v5e:
    gb=4 → 418 GB/s int8-equivalent (0.14 ms @ 4096×14336), ~2.4× the
    XLA dequant fallback."""

    def kernel(x_ref, w_ref, scale_ref, out_ref, acc_ref):
        # Grid = (n_block parallel, k_block reduction): dim 1 is the
        # sequential reduction this accumulator follows.
        @pl.when(pl.program_id(1) == 0)
        def _init():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        x = x_ref[...]
        half = group // 2
        total = jnp.zeros_like(acc_ref)
        for i in range(gb):
            p = w_ref[i * half:(i + 1) * half, :].astype(jnp.int32)
            lo = jnp.right_shift(jnp.left_shift(p, 28), 28).astype(jnp.bfloat16)
            hi = jnp.right_shift(p, 4).astype(jnp.bfloat16)
            xg = x[:, i * group:(i + 1) * group]
            d = jnp.dot(xg[:, :half], lo, preferred_element_type=jnp.float32)
            d += jnp.dot(xg[:, half:], hi, preferred_element_type=jnp.float32)
            total += d * scale_ref[0, i][None].astype(jnp.float32)
        acc_ref[...] += total

        @pl.when(pl.program_id(1) == pl.num_programs(1) - 1)
        def _finish():
            out_ref[...] = acc_ref[...].astype(out_ref.dtype)

    return kernel


@functools.partial(jax.jit, static_argnames=("out_dtype", "interpret"))
def quantized_matmul_int4(
    x: jnp.ndarray,
    wq4: jnp.ndarray,
    scale4: jnp.ndarray,
    out_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jnp.ndarray:
    """x [M, K] @ dequant_int4(wq4 [K/2, N], scale4 [G, N]) → [M, N].

    Reads each int4 weight once (¼ the bytes of bf16, ½ of int8). The VPU
    unpack makes it ~10% slower per matmul than XLA's fused int8 dot on a
    free chip, but it halves weight HBM *footprint* (7 GB → 3.5 GB for
    Zephyr-7B) — the capacity option, like the reference's `load_4bit`.
    """
    M, K = x.shape
    Kh, N = wq4.shape
    assert K == 2 * Kh, (x.shape, wq4.shape)
    G = scale4.shape[0]
    group = K // G
    assert group % 2 == 0 and Kh % G == 0
    gb = 4 if G % 4 == 0 else (2 if G % 2 == 0 else 1)

    M_pad = max(8, ((M + 7) // 8) * 8)
    if M_pad != M:
        x = jnp.pad(x, ((0, M_pad - M), (0, 0)))

    # Block the output dimension so the kernel's VMEM stack (acc + out +
    # int8 panels + the int32 unpack temporaries, which dominate) stays
    # under Mosaic's scoped limit at any M / N.
    def vmem_est(bn):
        return (M_pad * bn * 6                 # f32 acc + bf16 out
                + 2 * (gb * group // 2) * bn   # double-buffered int8 panels
                + group * bn * 6)              # lo/hi i32 + bf16 temporaries
    # Mosaic needs block_n to be a multiple of 128 (lane tile) or equal to
    # N, so walk the lane-aligned divisors of N from largest down.
    block_n = N
    if vmem_est(N) > 10_000_000 and N % 128 == 0:
        candidates = [d * 128 for d in range(N // 128, 0, -1)
                      if N % (d * 128) == 0]
        for bn in candidates:
            block_n = bn
            if vmem_est(bn) <= 10_000_000:
                break
    grid = (N // block_n, G // gb)

    # Mosaic requires the last two block dims be tile-aligned or full; a
    # [G/gb, gb, N] view lets each grid step take its groups' scale rows whole.
    scale4 = scale4.reshape(G // gb, gb, N)

    out = pl.pallas_call(
        _make_kernel_int4(group, gb),
        out_shape=jax.ShapeDtypeStruct((M_pad, N), out_dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=grid,
            in_specs=[
                pl.BlockSpec((M_pad, group * gb), lambda n, g: (0, g)),
                pl.BlockSpec((group * gb // 2, block_n), lambda n, g: (g, n)),
                pl.BlockSpec((1, gb, block_n), lambda n, g: (g, 0, n)),
            ],
            out_specs=pl.BlockSpec((M_pad, block_n), lambda n, g: (0, n)),
            scratch_shapes=[pltpu.VMEM((M_pad, block_n), jnp.float32)],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * M_pad * K * N,
            bytes_accessed=M_pad * K * 2 + Kh * N + M_pad * N * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, wq4, scale4)
    return out[:M] if M_pad != M else out


def qdot(x: jnp.ndarray, p: dict, use_pallas: bool = True,
         lora_dropout=None) -> jnp.ndarray:
    """Dense apply for raw or quantized dense params, with optional LoRA.

    `x`: [..., K]; `p`: {"kernel": [K, N]} or {"kernel_q", "scale"}, plus
    optional LoRA leaves {"lora_a": [K, r], "lora_b": [r, N],
    "lora_scale": scalar} whose contribution `(x@A)@B * scale` is added
    (stage-2 adapters, reference peft wrap `train/train.py:775-787`).
    `lora_dropout`: optional `(rng, rate)` — train-time dropout on the
    LoRA branch's INPUT only (peft semantics: `B(A(dropout(x)))`; the
    frozen base path never sees dropout). Reference recipe: rate 0.05,
    `script/finetune.sh`.
    Uses the Pallas kernel on TPU backends when the shapes tile; otherwise
    falls back to dequant + einsum (CPU tests, odd shapes).
    """
    out = _base_dot(x, p, use_pallas)
    if "lora_a" in p:
        xl = x
        if lora_dropout is not None:
            rng, rate = lora_dropout
            keep = jax.random.bernoulli(rng, 1.0 - rate, x.shape)
            xl = jnp.where(keep, x / (1.0 - rate), 0.0).astype(x.dtype)
        delta = jnp.einsum("...k,kr->...r", xl, p["lora_a"].astype(x.dtype))
        delta = jnp.einsum("...r,rn->...n", delta, p["lora_b"].astype(x.dtype))
        out = out + delta * p["lora_scale"].astype(x.dtype)
    return out


def _base_dot(x: jnp.ndarray, p: dict, use_pallas: bool) -> jnp.ndarray:
    if "kernel_q4" in p:
        from .quant import dequant_int4

        wq4, scale4 = p["kernel_q4"], p["scale4"]
        Kh, N = wq4.shape[-2:]
        K = 2 * Kh
        lead = x.shape[:-1]
        m = 1
        for d in lead:
            m *= int(d)
        group = K // scale4.shape[-2]
        # int4 matvec: the Pallas kernel reads each packed byte once. XLA's
        # fallback dequant materializes the bf16 weights (the unpack concat
        # defeats operand fusion), so the kernel is the production decode
        # path; the fallback covers CPU tests / odd shapes / prefill.
        pallas_ok = (
            use_pallas
            and jax.default_backend() not in ("cpu",)
            and group % 2 == 0
            and N % 128 == 0
            and group % 128 == 0
            and m <= 128  # decode batches; measured through B=128 (vmem_est
                          # shrinks block_n as M grows). Prefill/training
                          # (large M) take XLA's fused dot.
        )
        if pallas_ok:
            out = quantized_matmul_int4(
                x.reshape(m, K), wq4, scale4, out_dtype=x.dtype
            )
            return out.reshape(*lead, N)
        return jnp.einsum("...k,kn->...n", x, dequant_int4(p, x.dtype))
    if "kernel_q" not in p:
        return jnp.einsum("...k,kn->...n", x, p["kernel"])

    wq, scale = p["kernel_q"], p["scale"]
    K, N = wq.shape[-2:]
    small_m = int(jnp.prod(jnp.asarray(x.shape[:-1]))) if False else None
    lead = x.shape[:-1]
    m = 1
    for d in lead:
        m *= int(d)
    # The panel kernel targets the decode/matvec regime (small M); large-M
    # matmuls (prefill/training) go through XLA's fused int8 dot, which
    # tiles both operands properly.
    pallas_ok = (
        use_pallas
        and _PALLAS_QMM_ENABLED
        and jax.default_backend() not in ("cpu",)
        and K % 512 == 0
        and N % 128 == 0
        and m <= 64
    )
    if pallas_ok:
        out = quantized_matmul(x.reshape(m, K), wq, scale.reshape(1, N), out_dtype=x.dtype)
        return out.reshape(*lead, N)
    w = wq.astype(x.dtype) * scale.astype(x.dtype)
    return jnp.einsum("...k,kn->...n", x, w)
