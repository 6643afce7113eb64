"""Benchmark harness — run on real TPU hardware by the driver.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

Headline metric: Zephyr-7B decode tokens/sec/chip (full-size decoder,
int8 weight-only, bf16 activations, KV cache 2048). Extras report the
anyres vision throughput (336² preprocess → ViT-L/14-336 multi-layer encode
→ fusion → Q-Former, bf16) and prefill TTFT components.

vs_baseline: the reference publishes no throughput numbers
(BASELINE.md — `published` is empty). We normalize against an estimated
35 tokens/s for single-stream HF fp16 Zephyr-7B generate on A100-class
hardware (typical HF eager/flash decode rate for 7B models of that era),
which is the reference's serving configuration (`serve/cli.py`).
"""

import functools
import json
import os
import time

os.environ.setdefault("JAX_PLATFORMS", "")  # let the axon TPU plugin win

import jax

if os.environ.get("VZT_BENCH_PLATFORM"):  # harness smoke tests (e.g. "cpu")
    jax.config.update("jax_platforms", os.environ["VZT_BENCH_PLATFORM"])
import jax.numpy as jnp
import numpy as np

from vis_zephyr_tpu.config import VisZephyrConfig
from vis_zephyr_tpu.models.clip_vit import clip_vit_forward, init_clip_vit, select_and_stack
from vis_zephyr_tpu.models.fusion import dense_channel_fusion
from vis_zephyr_tpu.models.mistral import init_cache, mistral_forward
from vis_zephyr_tpu.models.qformer import init_qformer, qformer_forward

from vis_zephyr_tpu.data.image_pipeline import anyres_preprocess

A100_REFERENCE_DECODE_TOKS = 35.0  # see module docstring


def _sync(x):
    """True device sync. On the tunneled axon platform block_until_ready
    returns immediately; only a device_get round-trip actually waits, so we
    fetch a tiny scalar reduction of the result."""
    leaf = jax.tree_util.tree_leaves(x)[-1]
    return jax.device_get(jnp.asarray(leaf).ravel()[0])


def _random_quantized_mistral(dec, key, bits: int = 8):
    """Random int8/int4 decoder weights built directly quantized (a bf16
    init + quantize pass would transiently need ~22GB — more than one
    chip's HBM)."""
    L, D, I = dec.num_layers, dec.hidden_size, dec.intermediate_size
    Hq, Hkv, hd = dec.num_heads, dec.num_kv_heads, dec.head_dim

    def qdense8(key, shape):
        return {
            "kernel_q": jax.random.randint(key, shape, -127, 128, jnp.int8),
            "scale": jnp.full(shape[:-2] + (1, shape[-1]), 2e-4, jnp.float32),
        }

    def qdense4(key, shape, group=128):
        K = shape[-2]
        group = min(group, K)  # tiny-preset smoke configs
        return {
            "kernel_q4": jax.random.randint(
                key, shape[:-2] + (K // 2, shape[-1]), -127, 128, jnp.int8),
            "scale4": jnp.full(
                shape[:-2] + (K // group, shape[-1]), 2e-4, jnp.float32),
        }

    qdense = qdense4 if bits == 4 else qdense8

    k = jax.random.split(key, 10)
    return {
        "embed_tokens": jax.random.normal(k[0], (dec.vocab_size, D), jnp.bfloat16) * 0.02,
        "final_ln": {"scale": jnp.ones((D,), jnp.bfloat16)},
        "lm_head": {"kernel": jax.random.normal(k[1], (D, dec.vocab_size), jnp.bfloat16) * 0.02},
        "layers": {
            "input_ln": {"scale": jnp.ones((L, D), jnp.bfloat16)},
            "post_attn_ln": {"scale": jnp.ones((L, D), jnp.bfloat16)},
            "attn": {
                "q": qdense(k[2], (L, D, Hq * hd)),
                "k": qdense(k[3], (L, D, Hkv * hd)),
                "v": qdense(k[4], (L, D, Hkv * hd)),
                "out": qdense(k[5], (L, Hq * hd, D)),
            },
            "mlp": {
                "gate": qdense(k[6], (L, D, I)),
                "up": qdense(k[7], (L, D, I)),
                "down": qdense(k[8], (L, I, D)),
            },
        },
    }


def bench_decode(cfg: VisZephyrConfig, steps: int = 64, warmup: int = 8,
                 batch_slots: int = 16) -> dict:
    """Decode tokens/sec on the full 7B decoder (int8 weights, inference-
    fused qkv/gate_up layout): single-stream latency AND continuous-batching
    aggregate throughput (B=16 slots sharing one step — the production
    serving configuration, serve/batching.py)."""
    from vis_zephyr_tpu.models.mistral import fuse_decoder_layers

    dec = cfg.decoder
    params = fuse_decoder_layers(_random_quantized_mistral(dec, jax.random.PRNGKey(0)))

    @functools.partial(jax.jit, static_argnames=("n",))
    def run(params, cache, token, n):
        def step(carry, _):
            cache, token = carry
            embeds = params["embed_tokens"][token[:, None]]
            logits, cache = mistral_forward(
                params, embeds, dec, cache["length"][:, None], cache=cache,
                logits_slice="last",
            )
            return (cache, jnp.argmax(logits[:, 0], axis=-1).astype(jnp.int32)), None

        (cache, token), _ = jax.lax.scan(step, (cache, token), None, length=n)
        return cache, token

    out = {}
    # One lax.scan program per measurement (the tunneled dispatch overhead
    # is ~25 ms/call; production decode loops are scan-shaped anyway). The
    # warmup call uses the SAME static step count so the timed calls hit a
    # fully compiled program.
    reps = 3
    for tag, B in (("single", 1), (f"batch{batch_slots}", batch_slots)):
        cache = init_cache(dec, B, 2048, dtype=jnp.bfloat16)
        cache["length"] = jnp.full((B,), 512, jnp.int32)  # post-prefill state
        token = jnp.zeros((B,), jnp.int32)
        cache, token = run(params, cache, token, steps)
        _sync(token)
        t0 = time.perf_counter()
        for _ in range(reps):
            cache, token = run(params, cache, token, steps)
        _sync(token)
        dt = (time.perf_counter() - t0) / reps
        out[f"decode_tokens_per_sec_{tag}"] = steps * B / dt
        out[f"decode_ms_per_step_{tag}"] = dt / steps * 1e3
    return out


def bench_decode_paged(cfg: VisZephyrConfig, steps: int = 64, slots: int = 32,
                       prompt_len: int = 512, bits: int = 8) -> dict:
    """Aggregate decode throughput on the paged-KV batcher's step program
    (serve/paged.py) at slot counts the dense cache cannot hold: B=32 needs
    ~2.7 GB of pool vs 8.6 GB dense. bits=4 frees another 3.5 GB of
    weights for pool (the --load-4bit serving configuration) — the highest
    slot counts ride int4."""
    from vis_zephyr_tpu.models.mistral import fuse_decoder_layers
    from vis_zephyr_tpu.serve.generate import SamplingConfig
    from vis_zephyr_tpu.serve.paged import _paged_step

    dec = cfg.decoder
    params = {"decoder": fuse_decoder_layers(
        _random_quantized_mistral(dec, jax.random.PRNGKey(0), bits=bits))}
    ps, cache_len = 128, 2048
    pps = cache_len // ps
    pages_per_req = -(-(prompt_len + steps * 4) // ps)  # slack for the scan
    num_pages = 1 + slots * pages_per_req
    L, Hkv, D = dec.num_layers, dec.num_kv_heads, dec.head_dim
    kp = jnp.zeros((Hkv, L * num_pages, ps, D), jnp.bfloat16)
    vp = jnp.zeros_like(kp)
    table = np.zeros((slots, pps), np.int32)
    for b in range(slots):
        table[b, :pages_per_req] = 1 + b * pages_per_req + np.arange(pages_per_req)
    table = jnp.asarray(table)
    lengths = jnp.full((slots,), prompt_len, jnp.int32)
    token = jnp.zeros((slots,), jnp.int32)
    active = jnp.ones((slots,), bool)
    sampling = SamplingConfig(temperature=0.0, eos_token_id=-1)
    key = jax.random.PRNGKey(1)

    # Donate the pools: without it the un-aliased output copy doubles the
    # pool footprint and OOMs next to the 7 GB int8 params.
    @functools.partial(jax.jit, static_argnames=("n",), donate_argnums=(1, 2, 3, 4))
    def run(params, kp, vp, lengths, token, n):
        def step(carry, _):
            kp, vp, lengths, token = carry
            token, kp, vp, lengths = _paged_step(
                params, kp, vp, table, lengths, token, active, key, cfg, sampling
            )
            return (kp, vp, lengths, token), None

        (kp, vp, lengths, token), _ = jax.lax.scan(
            step, (kp, vp, lengths, token), None, length=n
        )
        return kp, vp, lengths, token

    if os.environ.get("VZT_PAGED_HOST_LOOP") == "1":
        # Production shape: one donated jit call per step (what the batcher
        # actually runs) — the scan wrapper's carry forces an extra pool
        # copy per step that per-call donation avoids. Dispatches pipeline
        # asynchronously; sync once at the end.
        tok2, kp, vp, lengths = _paged_step(
            params, kp, vp, table, lengths, token, active, key, cfg, sampling
        )
        _sync(tok2)
        t0 = time.perf_counter()
        n = steps * 3
        for _ in range(n):
            tok2, kp, vp, lengths = _paged_step(
                params, kp, vp, table, lengths, tok2, active, key, cfg, sampling
            )
        _sync(tok2)
        dt = (time.perf_counter() - t0) / n
        tag = "paged" if bits == 8 else "paged4"
        return {
            f"{tag}_decode_tokens_per_sec_batch{slots}": slots / dt,
            f"{tag}_decode_ms_per_step_batch{slots}": dt * 1e3,
            f"{tag}_slots": slots,
            f"{tag}_loop": "host",
        }

    kp, vp, lengths, token = run(params, kp, vp, lengths, token, steps)
    _sync(token)
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        kp, vp, lengths, token = run(params, kp, vp, lengths, token, steps)
    _sync(token)
    dt = (time.perf_counter() - t0) / reps
    tag = "paged" if bits == 8 else "paged4"
    return {
        f"{tag}_decode_tokens_per_sec_batch{slots}": steps * slots / dt,
        f"{tag}_decode_ms_per_step_batch{slots}": dt / steps * 1e3,
        f"{tag}_slots": slots,
    }


def bench_prefill(cfg: VisZephyrConfig, tokens: int = 640, iters: int = 4) -> dict:
    """Decoder prefill latency for a spliced multimodal sequence (text +
    4×32 image tokens ≈ 640 total) — the LLM share of TTFT."""
    from vis_zephyr_tpu.models.mistral import fuse_decoder_layers, mistral_forward

    dec = cfg.decoder
    params = fuse_decoder_layers(_random_quantized_mistral(dec, jax.random.PRNGKey(0)))
    embeds = jax.random.normal(jax.random.PRNGKey(3), (1, tokens, dec.hidden_size), jnp.bfloat16)
    pos = jnp.broadcast_to(jnp.arange(tokens), (1, tokens))

    @jax.jit
    def prefill(params, embeds):
        logits, _ = mistral_forward(params, embeds, dec, pos, return_kv=True)
        return logits[:, -1]

    y = prefill(params, embeds)
    _sync(y)
    t0 = time.perf_counter()
    for _ in range(iters):
        y = prefill(params, embeds)
    _sync(y)
    return {"prefill_640_ms": (time.perf_counter() - t0) / iters * 1e3}


def bench_vision(cfg: VisZephyrConfig, iters: int = 16, warmup: int = 3, batch_images: int = 4) -> dict:
    """anyres images/sec/chip: on-device preprocess (resize/pad/tile/
    normalize) + ViT-L encode + fusion + Q-Former projection, bf16."""
    # bf16 throughput configuration: at batch 16 the projector is compute-
    # bound, so int8 weight-only (the load_8bit serving option) would only
    # add convert overhead here.
    key = jax.random.PRNGKey(1)
    vparams = init_clip_vit(cfg.vision, key, dtype=jnp.bfloat16)
    pparams = init_qformer(cfg.projector, jax.random.fold_in(key, 1), dtype=jnp.bfloat16)

    P = 4  # 1 global + 3 tiles (1008×336-class pinpoint, scaled to cfg size)
    S = cfg.vision.image_size
    raw = jnp.asarray(
        np.random.default_rng(0).integers(0, 256, (batch_images, 3 * S, S, 3), np.uint8)
    )
    cond_len = 64
    cond = jax.random.normal(
        jax.random.fold_in(key, 2),
        (batch_images * P, cond_len, cfg.projector.hidden_size), jnp.bfloat16,
    )

    @jax.jit
    def encode(vparams, pparams, raw, cond):
        def prep(img):
            px, valid = anyres_preprocess(
                img, target_size=S, best_fit=(S, 3 * S),
                patch_size=S, max_patches=P,
            )
            return px, valid

        pixels, _ = jax.vmap(prep)(raw)                     # [B, P, S, S, 3]
        flat = pixels.reshape((-1,) + pixels.shape[2:]).astype(jnp.bfloat16)
        hidden = clip_vit_forward(vparams, flat, cfg.vision)
        fused = dense_channel_fusion(
            select_and_stack(hidden, cfg.vision), cfg.vision.num_fusion_groups
        )
        return qformer_forward(pparams, fused, cfg.projector, text_embeddings=cond)

    for _ in range(warmup):
        out = encode(vparams, pparams, raw, cond)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = encode(vparams, pparams, raw, cond)
    _sync(out)
    dt = time.perf_counter() - t0
    per_image = dt / (iters * batch_images)
    return {
        "anyres_images_per_sec": 1.0 / per_image,
        "anyres_encode_ms_per_image": per_image * 1e3,
    }


def _bench_config() -> VisZephyrConfig:
    if os.environ.get("VZT_BENCH_PRESET") == "tiny":  # harness smoke tests
        from vis_zephyr_tpu.config import tiny_config

        return tiny_config()
    return VisZephyrConfig()


def run_phase(phase: str, decode_slots: int = 16) -> None:
    """Run one bench phase and print its results dict as the last stdout
    line (consumed by the parent orchestrator)."""
    cfg = _bench_config()
    if phase == "vision":
        out = bench_vision(cfg)
    elif phase == "prefill":
        out = bench_prefill(cfg)
    elif phase == "decode":
        out = bench_decode(cfg, batch_slots=decode_slots)
        out["decode_slots"] = decode_slots
    elif phase in ("paged", "paged4"):
        # Interpret-mode Pallas (CPU smoke tests) is orders slower: shrink.
        tiny = os.environ.get("VZT_BENCH_PRESET") == "tiny"
        out = bench_decode_paged(
            cfg, slots=decode_slots, steps=2 if tiny else 64,
            prompt_len=32 if tiny else 512,
            bits=4 if phase == "paged4" else 8,
        )
    else:
        raise ValueError(f"unknown phase {phase!r}")
    out["device"] = str(jax.devices()[0])
    print(json.dumps(out))


# Phase plan: (phase, kwargs-attempts). Each attempt runs in its OWN
# subprocess — a fresh backend per phase guarantees HBM from a previous
# phase (or a transiently busy chip) can't poison the next one, and a
# crashed phase can't take the harness down. On failure we back off and
# retry; decode additionally falls back to fewer slots, keeping a real
# headline number even under memory pressure (round-1 lesson: a transient
# RESOURCE_EXHAUSTED zeroed the whole round).
_RETRY_BACKOFF_S = (45, 90)


def _proc_cpu_seconds(pid: int) -> float:
    """utime+stime of `pid` from /proc (Linux), in seconds."""
    try:
        with open(f"/proc/{pid}/stat") as f:
            parts = f.read().rsplit(")", 1)[1].split()
        ticks = int(parts[11]) + int(parts[12])  # utime, stime
        return ticks / os.sysconf("SC_CLK_TCK")
    except Exception:
        return float("inf")  # can't tell → assume healthy


def _run_phase_subprocess(phase: str, slots: int | None = None) -> dict | None:
    """Run one phase in a fresh process.

    Wedge detection: the tunneled axon device occasionally leaves a new
    client stuck forever in the acquisition handshake (observed: a process
    sits at <5 CPU-seconds for 20+ minutes while a FRESH process connects
    fine). Burning the full phase timeout on such a client would zero the
    round's numbers, so if the child has burned almost no CPU by 180 s we
    kill it and report a wedge — the caller's retry loop starts a fresh
    process, which is what actually resolves the state."""
    import subprocess
    import sys
    import time as _t

    cmd = [sys.executable, os.path.abspath(__file__), "--phase", phase]
    if slots is not None:
        cmd += ["--decode-slots", str(slots)]
    proc = subprocess.Popen(
        cmd, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        cwd=os.path.dirname(os.path.abspath(__file__)),
    )
    deadline = _t.monotonic() + 3600
    # Wedge = no CPU progress: a stuck acquisition sits at near-zero CPU
    # forever, while compile/run phases burn CPU continuously. Absolute
    # thresholds misfire (imports alone trickle ~10 s under load), so
    # require <2 CPU-seconds of progress across a 150 s window, checked
    # after a 120 s grace period.
    last_cpu = None
    last_cpu_t = _t.monotonic() + 120  # grace before the first window
    while True:
        try:
            out, err = proc.communicate(timeout=15)
            break
        except subprocess.TimeoutExpired:
            now = _t.monotonic()
            if now >= deadline:
                proc.kill()
                out, err = proc.communicate()
                return {"_error": f"{phase}: timeout"}
            if now >= last_cpu_t + 150:
                cpu = _proc_cpu_seconds(proc.pid)
                if last_cpu is not None and cpu - last_cpu < 2.0:
                    proc.kill()
                    proc.communicate()
                    return {"_error": f"{phase}: device-acquisition wedge"}
                last_cpu, last_cpu_t = cpu, now
    if proc.returncode != 0:
        tail = (err or out or "")[-400:]
        return {"_error": f"{phase}: rc={proc.returncode}: {tail}"}
    for line in reversed(out.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                return json.loads(line)
            except json.JSONDecodeError:
                continue
    return {"_error": f"{phase}: no JSON in output"}


def _phase_with_retries(phase: str, attempts: list) -> dict:
    """attempts: list of slots values (None for non-decode phases)."""
    last_err = None
    for i, slots in enumerate(attempts):
        if i > 0:
            time.sleep(_RETRY_BACKOFF_S[min(i - 1, len(_RETRY_BACKOFF_S) - 1)])
        out = _run_phase_subprocess(phase, slots)
        if out is not None and "_error" not in out:
            return out
        last_err = (out or {}).get("_error", f"{phase}: unknown failure")
    return {f"{phase}_error": str(last_err)[:300]}


def _wait_for_device_health(max_wait_s: float = 1500.0) -> float:
    """Absorb a device-acquisition wedge era BEFORE burning phase attempts.

    The tunneled device sometimes queues new clients for many minutes
    (stale sessions from killed processes age out server-side). A tiny
    probe subprocess — left alone, NEVER killed early — acquires as soon
    as the device is healthy; phases then start against a clean device
    instead of each spending their retry ladder on the wedge. Returns the
    seconds spent waiting (recorded in the output for postmortems)."""
    import subprocess
    import sys
    import time as _t

    if os.environ.get("VZT_BENCH_PLATFORM"):  # CPU smoke runs: no device
        return 0.0
    t0 = _t.monotonic()
    code = ("import jax, jax.numpy as jnp;"
            "print(float((jnp.ones((128,128))@jnp.ones((128,128))).sum()))")
    try:
        proc = subprocess.Popen([sys.executable, "-c", code],
                                stdout=subprocess.DEVNULL,
                                stderr=subprocess.DEVNULL)
        try:
            proc.wait(timeout=max_wait_s)
        except subprocess.TimeoutExpired:
            proc.kill()
            proc.wait()
    except Exception:
        pass
    return round(_t.monotonic() - t0, 1)


def main():
    # No device work in THIS process: a wedged acquisition here would take
    # the whole harness down with it. Phase subprocesses report the device.
    extras = {"device_health_wait_s": _wait_for_device_health()}

    extras.update(_phase_with_retries("vision", [None, None, None]))
    extras.update(_phase_with_retries("prefill", [None, None, None]))
    if "anyres_encode_ms_per_image" in extras and "prefill_640_ms" in extras:
        extras["ttft_ms_estimate"] = round(
            extras["anyres_encode_ms_per_image"] + extras["prefill_640_ms"], 1
        )
    # decode: retry at 16 slots, then degrade to 8 rather than report zero.
    extras.update(_phase_with_retries("decode", [16, 16, 16, 8]))
    # paged decode at slot counts a dense cache can't hold: try 64 first
    # (pool 6.5 GB + 7 GB int8 weights — fits when the chip is clean),
    # degrade to 32 then 16 on RESOURCE_EXHAUSTED.
    extras.update(_phase_with_retries("paged", [64, 64, 32, 16]))
    # int4 weights free ~3.5 GB for pool: the highest slot counts.
    extras.update(_phase_with_retries("paged4", [96, 96, 64]))

    slots = extras.get("decode_slots")
    dense = extras.get(f"decode_tokens_per_sec_batch{slots}") if slots else None
    pslots = extras.get("paged_slots")
    paged = extras.get(f"paged_decode_tokens_per_sec_batch{pslots}") if pslots else None
    p4slots = extras.get("paged4_slots")
    paged4 = extras.get(f"paged4_decode_tokens_per_sec_batch{p4slots}") if p4slots else None
    # Headline: best serving throughput measured (paged usually wins on
    # slot count; dense remains the floor).
    value, tag = None, None
    if dense is not None:
        value, tag = dense, f"batch{slots}"
    if paged is not None and (value is None or paged > value):
        value, tag = paged, f"paged_batch{pslots}"
    if paged4 is not None and (value is None or paged4 > value):
        value, tag = paged4, f"paged_int4_batch{p4slots}"
    if value is not None:
        result = {
            "metric": f"zephyr7b_decode_tokens_per_sec_per_chip_{tag}",
            "value": round(value, 2),
            "unit": "tokens/s",
            "vs_baseline": round(value / A100_REFERENCE_DECODE_TOKS, 3),
        }
    else:
        v = extras.get("anyres_images_per_sec", 0.0)
        result = {
            "metric": "anyres_images_per_sec_per_chip",
            "value": round(v, 2),
            "unit": "images/s",
            "vs_baseline": None,
        }
    result.update({k: (round(v, 3) if isinstance(v, float) else v) for k, v in extras.items()})
    print(json.dumps(result))


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--phase", choices=["vision", "prefill", "decode", "paged", "paged4"])
    ap.add_argument("--decode-slots", type=int, default=16)
    cli = ap.parse_args()
    if cli.phase:
        run_phase(cli.phase, decode_slots=cli.decode_slots)
    else:
        main()
