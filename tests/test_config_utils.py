"""Config tree round-trips + metrics logger."""

import json

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
