"""Does slots-per-cell batching (SL) actually reduce the KV row-update
RMW cost at serving shape?

Motivation: the r4 SL=8 rewrite targeted a measured 2.47 ms/step
latency-bound RMW at B=128 (fused int8 pools), but the end-to-end pagedqf
step time did not move (25.21 ms one-slot-per-cell dev run vs 25.37 ms
with SL=8 + the scoped-vmem fix, both v5e). This probe times the kernel
STANDALONE at the full 7B serving shape across SL ∈ {1, 2, 4, 8} (via the
VZT_KV_SL env knob, which must be set per process — the SL is baked at
trace time), isolating the RMW from the rest of the step.

Run:  python experiments/kv_update_sl_probe.py        (on the TPU)

One process sweeps SL ∈ {1, 2, 4, 8}: the knob is read at trace time, so
the probe sets the env var and clears the jit cache between settings —
one device acquisition, no killed TPU-holding processes (a kill wedges
the next acquisition ~10 min on this tunneled stack).
"""

import functools
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from vis_zephyr_tpu.ops.paged_attention import paged_kv_update_rows_q


def probe_sl(sl: int):
    os.environ["VZT_KV_SL"] = str(sl)
    paged_kv_update_rows_q.clear_cache()  # SL is baked at trace time

    Hkv, L, D, B, ps = 8, 32, 128, 128, 128
    # Match the pagedqf bench pool: 1 + B*pages_per_req logical pages.
    P = 1 + B * 6
    NP = L * P
    rng = np.random.default_rng(0)
    pages = jnp.asarray(1 + rng.permutation(B) * 6, jnp.int32)
    offs = jnp.asarray(rng.integers(0, ps, B), jnp.int32)
    ks = jnp.asarray(rng.normal(size=(L, B, Hkv, D)), jnp.bfloat16)
    vs = jnp.asarray(rng.normal(size=(L, B, Hkv, D)), jnp.bfloat16)
    kp = jnp.zeros((Hkv, NP, 2 * ps, D), jnp.int8)          # fused pool
    ksc = jnp.ones((Hkv, NP, 1, 2 * ps), jnp.float32)

    @functools.partial(jax.jit, static_argnames=("n",), donate_argnums=(0, 1))
    def run(kp, ksc, ks, vs, n):
        def step(carry, _):
            kp, ksc = carry
            kp, _, ksc, _ = paged_kv_update_rows_q(
                kp, None, ksc, None, ks, vs, pages, offs, interpret=False)
            return (kp, ksc), None

        (kp, ksc), _ = jax.lax.scan(step, (kp, ksc), None, length=n)
        return kp, ksc

    steps = 32
    kp, ksc = run(kp, ksc, ks, vs, steps)
    jax.device_get(ksc[0, 0, 0, 0])
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        kp, ksc = run(kp, ksc, ks, vs, steps)
    jax.device_get(ksc[0, 0, 0, 0])
    dt = (time.perf_counter() - t0) / (reps * steps)
    del kp, ksc
    # Actual tile traffic per step (RMW = read + write of every touched
    # tile): 2 pools(K,V tiles) × B × Hkv × L × 32 rows × D bytes × 2(R+W)
    # + scale blocks.
    bytes_rw = 2 * B * Hkv * L * (32 * D * 1 * 2 + 2 * ps * 4 * 2)
    print({"sl": sl, "ms_per_step": round(dt * 1e3, 3),
           "effective_gbps": round(bytes_rw / dt / 1e9, 1)}, flush=True)


def main():
    for sl in (1, 2, 4, 8):
        probe_sl(sl)


if __name__ == "__main__":
    main()
