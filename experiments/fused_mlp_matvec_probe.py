"""Single-stream decode probe: does FUSING the whole MLP (gate+up matvec,
SiLU·mul, down matvec) into one Pallas kernel beat XLA's three fused
dequant-dots at B=1?

Context (ROADMAP "fused decode-layer kernel"): single-stream decode runs
at 10.70 ms/token ≈ 654 GB/s of int8 weight reads vs ~819 GB/s v5e HBM
peak, and the MLP is 176 MB of the 202 MB/layer — if a fused kernel can't
recover bandwidth HERE, a full fused decode-layer (qkv+RoPE+attn+out+MLP)
can't either, and the remaining single-stream gap is XLA per-op overhead
we can't reach. The kernel streams [D, bi] gate / up panels and the
[bi, D] down panel per grid step (Mosaic double-buffers across steps),
keeps h = silu(g)·u in VMEM (never materialized to HBM), and accumulates
the down-projection across steps.

Run: python experiments/fused_mlp_matvec_probe.py   (on the TPU)
"""

import functools
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bench import _sync

D, I = 4096, 14336
L = 32  # layer-equivalents per timed step (one scan program)


def _kernel(x_ref, wg_ref, wu_ref, sg_ref, su_ref, wd_ref, sd_ref,
            out_ref, acc_ref):
    @pl.when(pl.program_id(0) == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    x = x_ref[...].astype(jnp.bfloat16)                     # [M, D]
    g = jnp.dot(x, wg_ref[...].astype(jnp.bfloat16),
                preferred_element_type=jnp.float32)
    g = g * sg_ref[...].astype(jnp.float32)
    u = jnp.dot(x, wu_ref[...].astype(jnp.bfloat16),
                preferred_element_type=jnp.float32)
    u = u * su_ref[...].astype(jnp.float32)
    h = (g * jax.nn.sigmoid(g) * u).astype(jnp.bfloat16)    # [M, bi]
    acc_ref[...] += jnp.dot(h, wd_ref[...].astype(jnp.bfloat16),
                            preferred_element_type=jnp.float32)

    @pl.when(pl.program_id(0) == pl.num_programs(0) - 1)
    def _finish():
        out_ref[...] = (acc_ref[...]
                        * sd_ref[...].astype(jnp.float32)).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_i",))
def fused_mlp_matvec(x, wgu, sgu, wd, sd, block_i: int = 2048):
    """x [M, D] → silu(x@Wg·sg) * (x@Wu·su) @ Wd · sd, one kernel.

    wgu: fused gate|up int8 [D, 2I] (the serving layout), sgu [1, 2I];
    wd [I, D] int8, sd [1, D]."""
    M = x.shape[0]
    grid = (I // block_i,)
    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((M, D), lambda i: (0, 0)),             # x
            pl.BlockSpec((D, block_i), lambda i: (0, i)),       # gate panel
            pl.BlockSpec((D, block_i),
                         lambda i: (0, i + I // block_i)),      # up panel
            pl.BlockSpec((1, block_i), lambda i: (0, i)),       # gate scale
            pl.BlockSpec((1, block_i),
                         lambda i: (0, i + I // block_i)),      # up scale
            pl.BlockSpec((block_i, D), lambda i: (i, 0)),       # down panel
            pl.BlockSpec((1, D), lambda i: (0, 0)),             # down scale
        ],
        out_specs=pl.BlockSpec((M, D), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((M, D), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((M, D), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 2**20,
        ),
    )(x, wgu, wgu, sgu, sgu, wd, sd)


def xla_mlp(x, wgu, sgu, wd, sd):
    gu = jnp.einsum("md,dn->mn", x,
                    wgu.astype(jnp.bfloat16) * sgu.astype(jnp.bfloat16))
    g, u = gu[:, :I], gu[:, I:]
    h = (g * jax.nn.sigmoid(g.astype(jnp.float32)).astype(jnp.bfloat16) * u)
    return jnp.einsum("mi,id->md", h,
                      wd.astype(jnp.bfloat16) * sd.astype(jnp.bfloat16))


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1, D)) * 0.05, jnp.bfloat16)
    wgu = jnp.asarray(rng.integers(-127, 128, (D, 2 * I)), jnp.int8)
    sgu = jnp.full((1, 2 * I), 2e-4, jnp.float32)
    wd = jnp.asarray(rng.integers(-127, 128, (I, D)), jnp.int8)
    sd = jnp.full((1, D), 2e-4, jnp.float32)

    # Numerics check (bf16 tolerance; the two paths round differently).
    y_k = fused_mlp_matvec(x, wgu, sgu, wd, sd)
    y_x = jax.jit(xla_mlp)(x, wgu, sgu, wd, sd)
    err = float(jnp.max(jnp.abs(y_k.astype(jnp.float32)
                                - y_x.astype(jnp.float32))))
    ref = float(jnp.max(jnp.abs(y_x.astype(jnp.float32)))) + 1e-9
    print({"rel_err": err / ref}, flush=True)

    bytes_per_call = wgu.size + wd.size  # int8 weight bytes (the bound)

    def timed(tag, fn, **kw):
        @functools.partial(jax.jit, static_argnames=())
        def scan_fn(x):
            def body(x, _):
                y = fn(x, wgu, sgu, wd, sd, **kw)
                # keep magnitudes bounded so the scan doesn't overflow
                return (y * 1e-2 + x * 0.5).astype(jnp.bfloat16), None

            x, _ = jax.lax.scan(body, x, None, length=L)
            return x

        y = scan_fn(x)
        _sync(y)
        reps = 5
        t0 = time.perf_counter()
        for _ in range(reps):
            y = scan_fn(y)
        _sync(y)
        dt = (time.perf_counter() - t0) / (reps * L)
        print({tag: {"us_per_layer": round(dt * 1e6, 1),
                     "weight_gbps": round(bytes_per_call / dt / 1e9, 1)}},
              flush=True)
        return dt

    t_x = timed("xla", xla_mlp)
    for bi in (1024, 2048):
        t_k = timed(f"fused_bi{bi}", fused_mlp_matvec, block_i=bi)
        print({"speedup_vs_xla": round(t_x / t_k, 3), "block_i": bi},
              flush=True)


if __name__ == "__main__":
    main()
