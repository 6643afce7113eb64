"""Slot-grouped decode-attention kernel (SB) sweep at serving shape.

Context (ROADMAP, VERDICT r4 item 4): the folded kernel at B=128 fused
int8 measures 16.3 ms per 32-layer step-equiv vs a ~6.5 ms KV-fetch
bound; ~4.5 ms of the gap is per-program + per-block fixed cost (4096
programs/step × ~0.5 µs, one block each × ~0.6 µs —
`experiments/program_cost_probe.py`). `slot_block=SB` groups SB slots
per grid cell and batches their compute into one [SB·Hkv, SG, bk] dot
pair, dividing both fixed costs SB×.

Run: python experiments/fa_sb_probe.py    (on the TPU)

One process sweeps SB ∈ {1, 2, 4, 8}: slot_block is a jit-static arg, so
each setting is its own compile — no env knobs, no cache clearing, one
device acquisition.
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

from vis_zephyr_tpu.ops.paged_attention import paged_attention_fa

# 7B serving shape, pagedqf bench pool geometry.
B, Hq, Hkv, D, ps, pps = 128, 32, 8, 128, 128, 6
L = 32  # layer-equivalents per timed step


def main():
    rng = np.random.default_rng(0)
    NP = 1 + B * pps
    kvq = jnp.asarray(rng.integers(-127, 128, (Hkv, NP, 2 * ps, D)), jnp.int8)
    kvs = jnp.asarray(np.abs(rng.normal(size=(Hkv, NP, 1, 2 * ps))) + 0.1,
                      jnp.float32)
    table = jnp.asarray(
        1 + np.arange(B)[:, None] * pps + np.arange(pps)[None], jnp.int32)
    lengths = jnp.full((B,), 640, jnp.int32)
    q = jnp.asarray(rng.normal(size=(B, 1, Hq, D)) * 0.3, jnp.bfloat16)
    k_new = jnp.asarray(rng.normal(size=(B, Hkv, D)) * 0.3, jnp.bfloat16)
    v_new = jnp.asarray(rng.normal(size=(B, Hkv, D)) * 0.3, jnp.bfloat16)

    results = {}
    for sb, ppcb in ((1, None), (2, None), (4, None), (8, None),
                     (1, 5), (4, 5), (4, 4), (2, 5)):
        @functools.partial(jax.jit, static_argnames=("n",))
        def run(q, n, sb=sb, ppcb=ppcb):
            def body(q, _):
                o = paged_attention_fa(
                    q, kvq, None, table, lengths, lengths,
                    sliding_window=4096, k_scales=kvs,
                    k_new=k_new, v_new=v_new, slot_block=sb,
                    pages_per_block=ppcb)
                return (o * 1e-3 + q * 0.999).astype(q.dtype), None

            q, _ = jax.lax.scan(body, q, None, length=n)
            return q

        try:
            o = run(q, L)
            jax.block_until_ready(o)
        except Exception as e:
            print({"sb": sb, "error": f"{type(e).__name__}: {e}"[:300]},
                  flush=True)
            continue
        reps = 20
        t0 = time.perf_counter()
        for _ in range(reps):
            o = run(o, L)
        jax.block_until_ready(o)
        dt = (time.perf_counter() - t0) / reps
        fetch_bytes = L * B * 640 * Hkv * (D + 4) * 2  # int8 rows + scales
        results[(sb, ppcb)] = dt
        print({"sb": sb, "ppcb": ppcb,
               "ms_per_32layer_step": round(dt * 1e3, 3),
               "fetch_gbps": round(fetch_bytes / dt / 1e9, 1)}, flush=True)

    base = results.get((1, None))
    if base:
        for (sb, ppcb), dt in sorted(
                results.items(), key=lambda kv: kv[1]):
            print({"sb": sb, "ppcb": ppcb,
                   "speedup_vs_sb1": round(base / dt, 3)}, flush=True)


if __name__ == "__main__":
    main()
