"""Smoke tests pinning bench.py's coupling to serving internals.

bench.py calls private serving entry points (`serve.paged._paged_step`,
`models.mistral.mistral_forward`, ...) directly so its measurements hit the
exact production step programs. That coupling silently breaks when a serving
signature grows (round 3: `_paged_step` gained logprobs + penalty-count
returns and every headline paged phase started raising ValueError) — so the
phase functions are exercised here at tiny scale on CPU.
"""

import os

import pytest

os.environ.setdefault("VZT_BENCH_PLATFORM", "cpu")
os.environ.setdefault("VZT_BENCH_PRESET", "tiny")

import bench  # noqa: E402  (repo root is on sys.path under pytest)
from vis_zephyr_tpu.config import tiny_config  # noqa: E402


@pytest.mark.parametrize(
    "kwargs, tag",
    [
        ({"bits": 8, "kv_quant": True}, "pagedq"),
        ({"bits": 8, "kv_quant": True, "kv_fused": True}, "pagedqf"),
        ({"bits": 8}, "paged"),
        ({"bits": 4}, "paged4"),
    ],
)
def test_bench_paged_phase_runs(kwargs, tag):
    cfg = tiny_config()
    out = bench.bench_decode_paged(cfg, steps=2, slots=2, prompt_len=96,
                                   **kwargs)
    tps = out[f"{tag}_decode_tokens_per_sec_batch2"]
    assert tps > 0.0
    assert out[f"{tag}_slots"] == 2


def test_bench_dense_decode_phase_runs():
    cfg = tiny_config()
    out = bench.bench_decode(cfg, steps=2, batch_slots=2)
    assert out["decode_tokens_per_sec_single"] > 0.0
    assert out["decode_tokens_per_sec_batch2"] > 0.0


def test_bench_prefill_phase_runs():
    cfg = tiny_config()
    out = bench.bench_prefill(cfg, tokens=64, iters=1)
    assert out["prefill_640_ms"] > 0.0


def test_bench_train_phase_runs():
    cfg = tiny_config()
    out = bench.bench_train_step(cfg, batch_size=2, seq_len=128, steps=1)
    assert out["train_tokens_per_sec"] > 0.0
    assert out["train_loss_finite"]


def test_bench_ttft_phase_runs():
    cfg = tiny_config()
    out = bench.bench_ttft_server(cfg, n_requests=2, max_new_tokens=4)
    assert out["ttft_p50_ms"] > 0.0
    assert out["ttft_n_requests"] == 2


def test_headline_prefers_paged_fused_number():
    extras = {
        "pagedqf_slots": 2,
        "pagedqf_decode_tokens_per_sec_batch2": 123.0,
        "decode_tokens_per_sec_single": 9.0,
    }
    result = bench._headline(extras)
    assert result["value"] == 123.0
    assert result["unit"] == "tokens/s"


def test_headline_falls_back_to_single_stream():
    """r4's failure mode: every batch phase failed compile, single-stream
    decode succeeded at 93.42 tok/s — the headline must be that number,
    not an anyres 0.0."""
    extras = {
        "pagedqf_error": "JaxRuntimeError: INTERNAL: remote_compile: 500",
        "pagedq_error": "JaxRuntimeError: INTERNAL: remote_compile: 500",
        "decode_tokens_per_sec_single": 93.42,
    }
    result = bench._headline(extras)
    assert result["value"] == 93.42
    assert result["unit"] == "tokens/s"
    assert "single_stream" in result["metric"]
    assert result["vs_baseline"] == pytest.approx(93.42 / 35.0, abs=1e-3)


def test_headline_never_reports_phantom_anyres_zero():
    """With nothing measured at all the headline is an explicit
    no_phase_completed, not an anyres 0.0 that reads like a measurement."""
    result = bench._headline({"pagedqf_error": "boom"})
    assert result["metric"] == "no_phase_completed"
    assert result["value"] == 0.0


def test_retryable_error_classification():
    assert bench._retryable_error("RESOURCE_EXHAUSTED: out of HBM")
    assert not bench._retryable_error(
        "JaxRuntimeError: INTERNAL: http://127.0.0.1:8093/remote_compile: "
        "HTTP 500: tpu_compile_helper subprocess exit code 1")
    assert not bench._retryable_error("Mosaic lowering failed: bad slice")
    assert bench._retryable_error("SomeNovelError: who knows")


def test_run_phase_does_not_retry_compile_errors(monkeypatch):
    """A deterministic compile failure must consume ONE attempt, not the
    whole ladder (r4 burned 420 s recompiling pagedq at 3 slot counts)."""
    h = bench._Harness(budget_s=600)
    monkeypatch.setattr(bench, "_backend_alive", lambda: True)
    calls = []

    def exploding(slots):
        calls.append(slots)
        raise RuntimeError("INTERNAL: remote_compile: HTTP 500")

    h.run_phase("pagedq", exploding,
                [{"slots": 128}, {"slots": 64}, {"slots": 32}],
                min_time_s=0)
    assert calls == [128]
    assert h.extras["pagedq_nonretryable"] is True
    assert "pagedq_error" in h.extras


def test_run_phase_still_ladders_on_oom(monkeypatch):
    h = bench._Harness(budget_s=600)
    monkeypatch.setattr(bench, "_backend_alive", lambda: True)
    calls = []

    def oom_then_ok(slots):
        calls.append(slots)
        if slots > 64:
            raise RuntimeError("RESOURCE_EXHAUSTED: out of memory")
        return {"ok_slots": slots}

    h.run_phase("paged", oom_then_ok, [{"slots": 128}, {"slots": 64}],
                min_time_s=0)
    assert calls == [128, 64]
    assert h.extras["ok_slots"] == 64
    assert "paged_error" not in h.extras
