"""Eval harness tests: answer extraction golden cases + an end-to-end VCR
eval run on the reference fixture item with the tiny model."""

import json
import os
import types

import numpy as np
import pytest

from vis_zephyr_tpu.eval.answer_extraction import extract_answer, get_chunk, split_chunks

VCR_JSON = "/root/reference/playground/data/tuning/test.json"
VCR_IMAGES = "/root/reference/playground/data/tuning/images"


class TestExtractAnswer:
    @pytest.mark.parametrize(
        "text,expected",
        [
            ("The answer is (B) because...", "B"),
            ("Answer is: C.", "C"),
            ("A", "A"),
            ("D. The person is smiling", "D"),
            ("I think the answer here. It is B.", "B"),
            ("nothing useful at all", "A"),  # default
            ("BCD words. Then (C) appears.", "C"),
            ("b lowercase doesn't count", "A"),
        ],
    )
    def test_golden(self, text, expected):
        assert extract_answer(text) == expected


def test_chunking():
    items = list(range(10))
    chunks = split_chunks(items, 4)
    assert sum(chunks, []) == items
    assert get_chunk(items, 4, 0) == [0, 1, 2]
    assert get_chunk(items, 1, 0) == items


@pytest.mark.skipif(not os.path.exists(VCR_JSON), reason="reference fixture unavailable")
def test_eval_vqa_end_to_end(tmp_path, mock_tokenizer):
    import jax

    from vis_zephyr_tpu.config import tiny_config
    from vis_zephyr_tpu.eval.eval_vqa import build_parser, eval_model
    from vis_zephyr_tpu.models.vis_zephyr import init_vis_zephyr

    cfg = tiny_config(vocab_size=50000)  # room for the mock vocab ids
    params = init_vis_zephyr(cfg, jax.random.PRNGKey(0))

    answers = tmp_path / "answers.jsonl"
    args = build_parser().parse_args(
        [
            "--question-file", VCR_JSON,
            "--image-folder", VCR_IMAGES,
            "--answers-file", str(answers),
            "--visual-prompt-style", "vcr_qa",
            "--batch-size", "1",
            "--max-new-tokens", "4",
        ]
    )
    correct, total = eval_model(args, params=params, cfg=cfg, tokenizer=mock_tokenizer)
    assert total == 1
    lines = [json.loads(l) for l in answers.read_text().splitlines()]
    assert len(lines) == 1
    rec = lines[0]
    assert rec["extracted_answer"] in "ABCD"
    assert rec["gold_answer"] in "ABCD"
    assert "Answer with the option's letter" in rec["prompt"]


@pytest.mark.skipif(not os.path.exists(VCR_JSON), reason="reference fixture unavailable")
def test_eval_vqa_beam_search(tmp_path, mock_tokenizer):
    """--num-beams 2 runs real beam search end-to-end (HF generate
    parity; previously a documented NotImplementedError)."""
    import jax

    from vis_zephyr_tpu.config import tiny_config
    from vis_zephyr_tpu.eval.eval_vqa import build_parser, eval_model
    from vis_zephyr_tpu.models.vis_zephyr import init_vis_zephyr

    cfg = tiny_config(vocab_size=50000)
    params = init_vis_zephyr(cfg, jax.random.PRNGKey(0))
    answers = tmp_path / "answers_beam.jsonl"
    args = build_parser().parse_args(
        [
            "--question-file", VCR_JSON,
            "--image-folder", VCR_IMAGES,
            "--answers-file", str(answers),
            "--visual-prompt-style", "vcr_qa",
            "--batch-size", "1",
            "--max-new-tokens", "4",
            "--num-beams", "2",
        ]
    )
    correct, total = eval_model(args, params=params, cfg=cfg,
                                tokenizer=mock_tokenizer)
    assert total == 1
    rec = json.loads(answers.read_text().splitlines()[0])
    assert isinstance(rec["text"], str)


def test_eval_mmbench_end_to_end(tmp_path, mock_tokenizer, rng):
    import base64
    import csv
    import io

    import jax
    from PIL import Image

    from vis_zephyr_tpu.config import tiny_config
    from vis_zephyr_tpu.eval.eval_mmbench import build_parser, eval_model
    from vis_zephyr_tpu.models.vis_zephyr import init_vis_zephyr

    buf = io.BytesIO()
    Image.fromarray(rng.integers(0, 255, (70, 100, 3), np.uint8).astype(np.uint8)).save(
        buf, format="PNG"
    )
    b64 = base64.b64encode(buf.getvalue()).decode()

    tsv = tmp_path / "mmbench.tsv"
    with open(tsv, "w", newline="") as f:
        w = csv.DictWriter(
            f, fieldnames=["index", "question", "hint", "A", "B", "C", "D", "answer", "image"],
            delimiter="\t",
        )
        w.writeheader()
        w.writerow({"index": 0, "question": "What color?", "hint": "Look closely",
                    "A": "red", "B": "blue", "C": "green", "D": "grey",
                    "answer": "B", "image": b64})
        w.writerow({"index": 1, "question": "How many?", "hint": "",
                    "A": "one", "B": "two", "C": "three", "D": "four",
                    "answer": "A", "image": b64})

    cfg = tiny_config(vocab_size=50000)
    params = init_vis_zephyr(cfg, jax.random.PRNGKey(0))
    answers = tmp_path / "mmbench_answers.jsonl"
    args = build_parser().parse_args(
        ["--question-file", str(tsv), "--answers-file", str(answers),
         "--batch-size", "2", "--max-new-tokens", "4"]
    )
    correct, with_gold, total = eval_model(args, params=params, cfg=cfg, tokenizer=mock_tokenizer)
    assert total == 2 and with_gold == 2
    lines = [json.loads(l) for l in answers.read_text().splitlines()]
    assert len(lines) == 2
    assert all(r["extracted_answer"] in "ABCD" for r in lines)
    assert "Look closely" in lines[0]["prompt"]


def test_mmbench_prompt_assembly():
    from vis_zephyr_tpu.eval.eval_mmbench import build_prompt

    row = {
        "question": "What is shown?",
        "hint": "A helpful hint",
        "A": "cat", "B": "dog", "C": "", "D": None,
    }
    p = build_prompt(row)
    assert p.startswith("<image>\n")
    assert "A helpful hint\nWhat is shown?" in p
    assert "\nA. cat" in p and "\nB. dog" in p
    assert "C." not in p
    assert p.endswith("directly.")
