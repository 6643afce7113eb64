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


def test_headline_prefers_paged_fused_number():
    extras = {
        "pagedqf_slots": 2,
        "pagedqf_decode_tokens_per_sec_batch2": 123.0,
        "decode_tokens_per_sec_single": 9.0,
    }
    result = bench._headline(extras)
    assert result["value"] == 123.0
    assert result["unit"] == "tokens/s"
