"""Decompose the B=128 fused-int8 paged decode step (~25.2 ms after the
bk=768 retune) into its independent pieces, each timed as its own jitted
32-layer scan at bench shapes:

  full       — the production `_paged_step` (sanity: should match bench)
  matmuls    — the decoder scan with attention replaced by a zero-cost
               stand-in (embed + rms_norms + qkv/rope + out + MLP + final
               norm + logits + greedy pick); bounded below by the ~8.5 ms
               int8 weight read (7 GB @ 819 GB/s)
  attention  — the paged kernel alone (known ~13.6 ms from the sweeps)
  poolwrite  — `paged_kv_update_rows_q` bulk row write alone

full − (matmuls + attention + poolwrite) ≈ step glue XLA can't fuse away
(sampling bookkeeping, lengths updates, cross-op boundaries)."""
import sys, time, json, functools
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from jax import lax

from vis_zephyr_tpu.config import VisZephyrConfig
from vis_zephyr_tpu.models.mistral import (
    _attn_out, _mlp, _project_qkv, embed, rms_norm, rope_cos_sin,
    fuse_decoder_layers)
from vis_zephyr_tpu.ops.paged_attention import (
    paged_attention_fa, paged_kv_update_rows_q)
from vis_zephyr_tpu.serve.generate import SamplingConfig
from vis_zephyr_tpu.serve.paged import _paged_step
from bench import _sync, _random_quantized_mistral

print("device:", jax.devices()[0], flush=True)
cfg = VisZephyrConfig(); dec = cfg.decoder
B, ps, steps, prompt = 128, 128, 8, 512
L, Hkv, D = dec.num_layers, dec.num_kv_heads, dec.head_dim
Hq = dec.num_heads
params = {"decoder": fuse_decoder_layers(
    _random_quantized_mistral(dec, jax.random.PRNGKey(0), bits=8))}
pps = 2048 // ps
ppr = -(-(prompt + steps * 4) // ps)
num_pages = 1 + B * ppr
kp = jnp.zeros((Hkv, L * num_pages, 2 * ps, D), jnp.int8)
ksp = jnp.ones((Hkv, L * num_pages, 1, 2 * ps), jnp.float32)
table = np.zeros((B, pps), np.int32)
for b in range(B):
    table[b, :ppr] = 1 + b * ppr + np.arange(ppr)
table = jnp.asarray(table)
lengths = jnp.full((B,), prompt, jnp.int32)
token = jnp.zeros((B,), jnp.int32)
active = jnp.ones((B,), bool)
sampling = SamplingConfig(temperature=0.0, eos_token_id=-1)
key = jax.random.PRNGKey(1)
out = {}


def timeit(name, fn, *args, reps=3, **static):
    y = fn(*args, **static); _sync(y)
    t0 = time.perf_counter()
    for _ in range(reps):
        y = fn(*args, **static)
    _sync(y)
    out[name] = round((time.perf_counter() - t0) / reps / steps * 1e3, 3)
    print(json.dumps(out), flush=True)


def timeit_state(name, fn, state, reps=3):
    """Time a donating step fn by threading its returned buffers back in
    (a donated operand is dead after the call that consumed it). Frees the
    final state so the next section can allocate its own pools."""
    state = fn(*state)
    _sync(state)
    t0 = time.perf_counter()
    for _ in range(reps):
        state = fn(*state)
    _sync(state)
    out[name] = round((time.perf_counter() - t0) / reps / steps * 1e3, 3)
    del state
    print(json.dumps(out), flush=True)


# ---- full production step ------------------------------------------------
@functools.partial(jax.jit, donate_argnums=(1, 2))
def _full(params, kp, ksp, lengths, token):
    def step(carry, _):
        kp, ksp, lengths, token = carry
        token, kp, _vp, (ksp, _vsp), lengths, _lp, _c = _paged_step(
            params, kp, None, (ksp, None), table, lengths, token, active,
            key, cfg, sampling)
        return (kp, ksp, lengths, token), None
    carry, _ = lax.scan(step, (kp, ksp, lengths, token), None, length=steps)
    return carry


def full(kp, ksp, lengths, token):
    # params is never donated/returned (a pass-through output would copy
    # the 7 GB of weights every call).
    return _full(params, kp, ksp, lengths, token)


timeit_state("full_ms", full, (kp, ksp, lengths, token))

# ---- matmuls-only: attention stubbed to a reshape ------------------------
@functools.partial(jax.jit, static_argnames=("n",))
def matmuls(params, lengths, token, n):
    dparams = params["decoder"]

    def one(token, lengths):
        positions = lengths[:, None]
        cos, sin = rope_cos_sin(positions, dec.head_dim, dec.rope_theta)
        h = embed(dparams, token[:, None])

        def body(h, xs):
            layer_params, i = xs
            hn = rms_norm(h, layer_params["input_ln"]["scale"],
                          dec.rms_norm_eps)
            q, k, v = _project_qkv(hn, layer_params["attn"], dec, cos, sin)
            # attention stand-in: mean of q heads grouped to v-width
            attn = q.reshape(B, 1, Hkv, Hq // Hkv, D).mean(axis=3)
            attn = jnp.broadcast_to(
                attn[:, :, :, None], (B, 1, Hkv, Hq // Hkv, D))
            attn = attn.reshape(B, 1, -1)
            h = h + _attn_out(attn, layer_params["attn"])
            hn = rms_norm(h, layer_params["post_attn_ln"]["scale"],
                          dec.rms_norm_eps)
            h = h + _mlp(hn, layer_params["mlp"])
            return h, (k[:, 0], v[:, 0])

        h, _rows = lax.scan(body, h, (dparams["layers"], jnp.arange(L)))
        h = rms_norm(h, dparams["final_ln"]["scale"], dec.rms_norm_eps)
        logits = jnp.einsum("btd,dv->btv", h[:, -1:],
                            dparams["lm_head"]["kernel"])
        return jnp.argmax(logits[:, 0], axis=-1).astype(jnp.int32)

    def step(carry, _):
        token, lengths = carry
        token = one(token, lengths)
        return (token, lengths + 1), None

    carry, _ = lax.scan(step, (token, lengths), None, length=n)
    return carry[0]


try:
    timeit("matmuls_ms", matmuls, params, lengths, token, n=steps)
except Exception as e:  # embed layout probe may not match; report and go on
    out["matmuls_error"] = f"{type(e).__name__}: {e}"[:200]
    print(json.dumps(out), flush=True)

# ---- attention kernel alone ----------------------------------------------
# (the full-step pools were donated away; re-create)
kp = jnp.zeros((Hkv, L * num_pages, 2 * ps, D), jnp.int8)
ksp = jnp.ones((Hkv, L * num_pages, 1, 2 * ps), jnp.float32)
q0 = jax.random.normal(jax.random.PRNGKey(2), (B, 1, Hq, D), jnp.bfloat16)
knb = jax.random.normal(jax.random.PRNGKey(3), (B, Hkv, D), jnp.bfloat16)
PPOOL = num_pages


@functools.partial(jax.jit, static_argnames=("n",))
def attn_only(kp, ksp, q, n):
    def step(q, _):
        def body(q, i):
            a = paged_attention_fa(q, kp, None, table + i * PPOOL, lengths,
                                   lengths, k_scales=ksp, v_scales=None,
                                   k_new=knb, v_new=knb)
            return a * 0.5 + q * 0.5, None
        q, _ = lax.scan(body, q, jnp.arange(L))
        return q, None
    q, _ = lax.scan(step, q, None, length=n)
    return q


timeit("attention_ms", attn_only, kp, ksp, q0, n=steps)

# ---- pool bulk write alone -------------------------------------------------
rows = jax.random.normal(jax.random.PRNGKey(4), (L, B, Hkv, D), jnp.bfloat16)
cur_page = jnp.asarray(np.arange(1, B * ppr + 1, ppr, dtype=np.int32))
offset = jnp.full((B,), prompt % ps, jnp.int32)


@functools.partial(jax.jit, donate_argnums=(0, 1))
def write_only(kp, ksp):
    def step(carry, _):
        kp, ksp = carry
        kp, _vp, ksp, _vsp = paged_kv_update_rows_q(
            kp, None, ksp, None, rows, rows, cur_page, offset)
        return (kp, ksp), None
    carry, _ = lax.scan(step, (kp, ksp), None, length=steps)
    return carry[0], carry[1]


kp = ksp = None  # free the attention pools before allocating new ones
timeit_state("poolwrite_ms", write_only,
             (jnp.zeros((Hkv, L * num_pages, 2 * ps, D), jnp.int8),
              jnp.ones((Hkv, L * num_pages, 1, 2 * ps), jnp.float32)))

rest = out.get("full_ms", 0) - out.get("matmuls_ms", 0) \
    - out.get("attention_ms", 0) - out.get("poolwrite_ms", 0)
out["residual_ms"] = round(rest, 3)
print(json.dumps(out), flush=True)
