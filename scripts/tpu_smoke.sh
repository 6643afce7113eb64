#!/bin/bash
# TPU smoke gate: compile every Pallas kernel ON THE REAL CHIP at
# production tile shapes (smoke_config: head_dim 128, 2 layers), in a few
# minutes. Run this after EVERY edit under vis_zephyr_tpu/ops/ and before
# ending a round — CPU tests run the kernels in interpret mode and cannot
# catch Mosaic lowering or scoped-vmem failures (round 4 shipped a
# kv-update rewrite that passed the whole CPU suite and broke compile on
# hardware).
#
# Structure: ONE bench.py process runs every serving/train phase
# in-process (one device acquisition, no kills — killing a TPU-holding
# process wedges the NEXT acquisition on this tunneled stack for
# ~10 min), then a second process compiles the kernels the bench phases
# don't reach (flash fwd+bwd, standalone paged reads).
#
# RUN THIS ON A QUIET STACK. The remote device broker reclaims sessions
# slowly: after ~2 h of back-to-back TPU processes (r5 measured),
# acquisition stalled 825 s in one run and past the whole 900 s budget
# in the next — every phase then reports *_skipped even though nothing
# is wrong with the kernels. If the final line shows a large
# `device_acquire_s` (or `device_error: acquisition did not return`),
# wait 15–25 min with NO TPU processes and re-run before concluding a
# kernel broke.
#
# Exit code 0 = every phase ran and no *_error/*_skipped keys in the
# final bench line.
set -u
cd "$(dirname "$0")/.."

fail=0

echo "--- bench phases (smoke preset, one process)"
# timeout must outlast bench's own watchdog INCLUDING the slow-acquisition
# budget extension (bench.py extends its deadline by up to one extra budget
# when the broker stalls) — a timeout kill on a TPU-holding process wedges
# the broker further.
out=$(VZT_BENCH_PRESET=smoke VZT_BENCH_BUDGET_S=900 timeout 2100 python bench.py 2>&1 | tail -1)
echo "$out"
if ! python - "$out" <<'EOF'
import json, sys
try:
    d = json.loads(sys.argv[1])
except Exception:
    print("SMOKE: final line is not JSON:", sys.argv[1][:500])
    raise SystemExit(1)
bad = {k: v for k, v in d.items()
       if k.endswith("_error") or k.endswith("_skipped")}
if bad:
    print("SMOKE: failed/skipped phases:", json.dumps(bad)[:2000])
    raise SystemExit(1)
print("SMOKE: all bench phases green")
EOF
then
    fail=1
fi

# Flash attention fwd+bwd (the training kernel; not exercised by the
# serving phases above) + the standalone paged-attention read kernels.
echo "--- flash attention fwd+bwd + paged read kernels"
# 1500 s: must survive a broker acquisition stall without killing a
# TPU-acquiring process (see header).
if ! timeout 1500 python - <<'EOF'
import jax, jax.numpy as jnp, numpy as np
from vis_zephyr_tpu.ops.flash_attention import flash_attention

B, H, Hkv, T, D = 2, 4, 2, 256, 128
key = jax.random.PRNGKey(0)
q = jax.random.normal(key, (B, T, H, D), jnp.bfloat16)
k = jax.random.normal(key, (B, T, Hkv, D), jnp.bfloat16)
v = jax.random.normal(key, (B, T, Hkv, D), jnp.bfloat16)

def loss(q, k, v):
    return flash_attention(q, k, v, causal=True).astype(jnp.float32).sum()

g = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(q, k, v)
jax.block_until_ready(g)
print("flash fwd+bwd OK")

from vis_zephyr_tpu.ops.paged_attention import (
    paged_attention, paged_attention_fa)
Hkv2, P, ps = 2, 8, 128
kp = jax.random.normal(key, (Hkv2, P, ps, D), jnp.bfloat16)
vp = jax.random.normal(key, (Hkv2, P, ps, D), jnp.bfloat16)
table = jnp.tile(jnp.arange(4, dtype=jnp.int32), (B, 1))
lengths = jnp.full((B,), 200, jnp.int32)
q1 = jax.random.normal(key, (B, H, D), jnp.bfloat16)
o = paged_attention(q1, kp, vp, table, lengths)
q2 = q1[:, None]  # [B, 1, Hq, D]
o2 = paged_attention_fa(q2, kp, vp, table, lengths, lengths - 1)
jax.block_until_ready((o, o2))
print("paged read kernels OK")
EOF
then
    echo "SMOKE FAIL: flash/paged kernels" >&2
    fail=1
fi

if [ "$fail" -eq 0 ]; then
    echo "TPU SMOKE: ALL GREEN"
else
    echo "TPU SMOKE: FAILURES (see above)" >&2
fi
exit "$fail"
