"""Probe: does int8 x int8 -> int32 dot hit the v5e MXU's 2x int8 rate at
decode-step shapes? Times a 32-layer scan of the four 7B fused panels,
current dequant-to-bf16 path vs w8a8 (dynamic per-token activation quant)."""
import time, json, functools
import jax, jax.numpy as jnp
import numpy as np

print("device:", jax.devices()[0], flush=True)
B = 128
PANELS = [(4096, 6144), (4096, 4096), (4096, 28672), (14336, 4096)]
L = 32

ws = [jnp.asarray(np.random.randint(-127, 128, (k, n)), jnp.int8)
      for k, n in PANELS]
xs0 = [jax.random.normal(jax.random.PRNGKey(i), (B, k), jnp.bfloat16)
       for i, (k, n) in enumerate(PANELS)]

@functools.partial(jax.jit, static_argnames=("n",))
def run_dequant(ws, xs, n):
    def step(xs, _):
        def layer(xs, _):
            outs = []
            for w, x in zip(ws, xs):
                h = jnp.dot(x, w.astype(jnp.bfloat16),
                            preferred_element_type=jnp.bfloat16)
                # fold the output back to the input shape to chain the scan
                outs.append(jnp.tanh(h[:, :x.shape[1]]
                                     if h.shape[1] >= x.shape[1] else
                                     jnp.pad(h, ((0, 0), (0, x.shape[1] - h.shape[1])))))
            return outs, None
        xs, _ = jax.lax.scan(layer, xs, None, length=L)
        return xs, None
    xs, _ = jax.lax.scan(step, xs, None, length=n)
    return xs[0]

@functools.partial(jax.jit, static_argnames=("n",))
def run_w8a8(ws, xs, n):
    def step(xs, _):
        def layer(xs, _):
            outs = []
            for w, x in zip(ws, xs):
                xm = jnp.max(jnp.abs(x), axis=1, keepdims=True)
                s = 127.0 / jnp.maximum(xm.astype(jnp.float32), 1e-6)
                xq = jnp.clip(jnp.round(x.astype(jnp.float32) * s),
                              -127, 127).astype(jnp.int8)
                acc = jax.lax.dot_general(
                    xq, w, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                h = (acc.astype(jnp.float32) / s).astype(jnp.bfloat16)
                outs.append(jnp.tanh(h[:, :x.shape[1]]
                                     if h.shape[1] >= x.shape[1] else
                                     jnp.pad(h, ((0, 0), (0, x.shape[1] - h.shape[1])))))
            return outs, None
        xs, _ = jax.lax.scan(layer, xs, None, length=L)
        return xs, None
    xs, _ = jax.lax.scan(step, xs, None, length=n)
    return xs[0]

out = {}
for name, fn in [("dequant_bf16", run_dequant), ("w8a8", run_w8a8)]:
    y = fn(ws, xs0, 2); y.block_until_ready()
    t0 = time.perf_counter()
    y = fn(ws, xs0, 8); y.block_until_ready()
    out[f"{name}_ms_per_step"] = round((time.perf_counter() - t0) / 8 * 1e3, 3)
print(json.dumps(out), flush=True)

# STATUS (r4, measured v5e): dequant_bf16 114.98 ms vs w8a8 173.02 ms per
# 32-layer x 4-panel scan step at B=128 — the XLA-lowered int8xint8 path
# is 1.5x SLOWER than the int8-weight dequant-to-bf16 dot it would
# replace: the dynamic per-token activation quant (f32 abs-max + round +
# clip over [128, 14336] on the VPU) and the int32->f32 rescale cost more
# than the MXU saves at decode batch sizes. w8a8 is therefore a reasoned
# non-goal at B<=128 unless a fused Pallas kernel folds the quantization
# into the matmul's operand load. (Absolute times here are NOT the
# production step cost — this probe re-materializes dequantized panels
#each iteration; only the relative comparison is meaningful.)
