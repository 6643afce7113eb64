"""Config tree round-trips + metrics logger."""

import json

import numpy as np

from vis_zephyr_tpu.config import VisZephyrConfig, tiny_config
from vis_zephyr_tpu.utils.metrics import MetricsLogger


def test_config_json_roundtrip():
    cfg = tiny_config(vocab_size=321)
    back = VisZephyrConfig.from_json(cfg.to_json())
    assert back == cfg
    assert back.decoder.vocab_size == 321


def test_config_defaults_match_released_checkpoint():
    cfg = VisZephyrConfig()
    # checkpoints/vis-zephyr-7b-v1-pretrain/config.json values.
    assert cfg.decoder.hidden_size == 4096
    assert cfg.decoder.num_layers == 32
    assert cfg.decoder.num_kv_heads == 8
    assert cfg.decoder.intermediate_size == 14336
    assert cfg.decoder.vocab_size == 32000
    assert cfg.decoder.sliding_window == 4096
    assert cfg.vision.fused_hidden_size == 5120  # mm_hidden_size
    assert cfg.projector.num_queries == 32
    assert cfg.mm_patch_merge_type == "flat"
    assert cfg.image_aspect_ratio == "anyres"
    assert cfg.vision.tokens_per_image == 576


def test_config_replace_and_hash():
    cfg = tiny_config()
    cfg2 = cfg.replace(tokenizer_model_max_length=64)
    assert cfg2.tokenizer_model_max_length == 64
    assert hash(cfg) != hash(cfg2)  # usable as a jit static arg


def test_metrics_logger(tmp_path):
    path = tmp_path / "m.jsonl"
    log = MetricsLogger(str(path), echo=False)
    log.log(1, loss=2.5, tokens=100)
    log.log(2, loss=2.0)
    log.close()
    rows = [json.loads(l) for l in path.read_text().splitlines()]
    assert rows[0]["step"] == 1 and rows[0]["loss"] == 2.5
    assert rows[1]["loss"] == 2.0


class TestServingMetrics:
    def test_histograms_and_summary(self, tmp_path):
        from vis_zephyr_tpu.utils.metrics import MetricsLogger, ServingMetrics

        path = str(tmp_path / "serve_metrics.jsonl")
        m = ServingMetrics(MetricsLogger(path, echo=False))
        for i in range(10):
            m.record_request(i, ttft_ms=50.0 + i, tpot_ms=12.0, n_tokens=5)
        s = m.summary()
        assert s["requests"] == 10 and s["tokens_out"] == 50
        assert s["ttft_ms"]["count"] == 10
        assert 50 <= s["ttft_ms"]["mean"] <= 60
        assert s["ttft_ms"]["p50"] >= 50
        assert s["tpot_ms"]["p99"] >= 12
        import json as _json

        rows = [_json.loads(l) for l in open(path)]
        assert len(rows) == 10 and rows[0]["tokens"] == 5

    def test_batcher_records_requests(self):
        import jax

        from vis_zephyr_tpu.config import tiny_config
        from vis_zephyr_tpu.models.vis_zephyr import init_vis_zephyr
        from vis_zephyr_tpu.serve.batching import ContinuousBatcher
        from vis_zephyr_tpu.serve.generate import SamplingConfig
        from vis_zephyr_tpu.utils.metrics import ServingMetrics

        cfg = tiny_config()
        params = init_vis_zephyr(cfg, jax.random.PRNGKey(0))
        metrics = ServingMetrics()
        b = ContinuousBatcher(
            params, cfg, max_slots=2, cache_len=64,
            sampling=SamplingConfig(max_new_tokens=4, temperature=0.0, eos_token_id=-1),
            metrics=metrics,
        )
        rng = np.random.default_rng(0)
        h = b.submit(rng.integers(5, cfg.decoder.vocab_size, (6,)))
        b.run_until_drained()
        assert len(list(b.stream(h))) == 4
        s = metrics.summary()
        assert s["requests"] == 1 and s["tokens_out"] == 4
        assert s["ttft_ms"]["count"] == 1 and s["tpot_ms"]["count"] == 1
