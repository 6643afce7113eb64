"""Measure per-PROGRAM fixed cost of the folded paged-attention kernel.

Two shapes with identical KV bytes and identical compute-block counts:
  A) B=128 slots x 640 tokens  -> 128 programs, 1 block each (ppcb=6)
  B) B=64  slots x 1280 tokens ->  64 programs, 2 blocks each (ppcb=6)
The time difference isolates program entry/exit + softmax-state init +
output-write cost for 64 programs per layer. If large, a slot-paired
grid (2 slots/program) is worth building.
"""
import sys, time, json, functools
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from vis_zephyr_tpu.ops.paged_attention import paged_attention_fa
from bench import _sync
from vis_zephyr_tpu.config import VisZephyrConfig

print("device:", jax.devices()[0], flush=True)
cfg = VisZephyrConfig(); dec = cfg.decoder
ps = 128
L = dec.num_layers
Hq, Hkv, hd = dec.num_heads, dec.num_kv_heads, dec.head_dim

def build(B, prompt):
    ppr = -(-(prompt + 4) // ps)
    num_pages = 1 + B * ppr
    kp = jnp.zeros((Hkv, L * num_pages, 2 * ps, hd), jnp.int8)
    ksp = jnp.ones((Hkv, L * num_pages, 1, 2 * ps), jnp.float32)
    cols = max(2048 // ps, ppr)
    table = np.zeros((B, cols), np.int32)
    for b in range(B):
        table[b, :ppr] = 1 + b * ppr + np.arange(ppr)
    table = jnp.asarray(table)
    lengths = jnp.full((B,), prompt, jnp.int32)
    q0 = jax.random.normal(jax.random.PRNGKey(2), (B, 1, Hq, hd), jnp.bfloat16)
    knb = jax.random.normal(jax.random.PRNGKey(3), (B, Hkv, hd), jnp.bfloat16)
    return kp, ksp, table, lengths, q0, knb, num_pages

def timer(B, prompt, ppcb):
    kp, ksp, table, lengths, q0, knb, P = build(B, prompt)
    @functools.partial(jax.jit, static_argnames=("n",))
    def attn_scan(kp, ksp, q, n):
        def step(q, _):
            def body(q, i):
                a = paged_attention_fa(q, kp, None, table + i * P, lengths,
                                       lengths, k_scales=ksp, v_scales=None,
                                       k_new=knb, v_new=knb,
                                       pages_per_block=ppcb)
                return a * 0.5 + q * 0.5, None
            q, _ = jax.lax.scan(body, q, jnp.arange(L))
            return q, None
        q, _ = jax.lax.scan(step, q, None, length=n)
        return q
    y = attn_scan(kp, ksp, q0, 8); _sync(y)
    t0 = time.perf_counter()
    for _ in range(3):
        y = attn_scan(kp, ksp, q0, 8)
    _sync(y)
    return round((time.perf_counter() - t0) / 3 / 8 * 1e3, 3)

out = {}
out["B128_t640_ppcb6_ms"] = timer(128, 640, 6)   # 128 programs, 1 blk
print(json.dumps(out), flush=True)
out["B64_t1280_ppcb6_ms"] = timer(64, 1280, 6)   # 64 programs, 2 blk
print(json.dumps(out), flush=True)
out["B64_t1280_ppcb12_ms"] = timer(64, 1280, 12) # 64 programs, 1 BIG blk
print(json.dumps(out), flush=True)
out["B32_t2560_ppcb6_ms"] = timer(32, 2560, 6)   # 32 programs, 4 blk
print(json.dumps(out), flush=True)
