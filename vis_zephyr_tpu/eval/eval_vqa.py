"""VCR evaluation: ViP-overlaid multiple-choice QA / QA→R.

Reference: `vis_zephyr/eval/eval_vqa.py` — per-item ViP overlay (constant
point style), anyres preprocess, greedy generate, regex answer extraction,
JSONL output with in-loop accuracy. The reference parallelizes by shell
fan-out over `--num-chunks/--chunk-idx` (one process per GPU); that flag
surface is kept, but within a process items are *batched* (`--batch-size`)
through one padded jitted prefill+decode instead of bs=1 loops.

Failure handling keeps the reference's semantics (`eval_vqa.py:79-88`):
ViP preprocessing is retried up to 10 times, then the item is substituted
with a random other item.
"""

from __future__ import annotations

import argparse
import json
import os
import random
from typing import Dict, List, Optional

import numpy as np

from ..config import VisZephyrConfig
from ..conversation import templates
from ..data.image_pipeline import anyres_preprocess_host
from ..data.tokenization import tokenize_with_images
from ..data.vip import visual_prompt_process
from ..serve.generate import SamplingConfig, generate, pad_to_bucket
from .answer_extraction import extract_answer, get_chunk


def prepare_item(
    record: Dict,
    image_folder: str,
    cfg: VisZephyrConfig,
    tokenizer,
    style: str,
    rng: random.Random,
    conv_mode: str = "zephyr_vcr",
) -> Dict:
    """One VCR item → overlaid+tiled pixels and tokenized prompt."""
    from PIL import Image

    image = Image.open(os.path.join(image_folder, record["image"])).convert("RGB")
    image, conversations = visual_prompt_process(
        record, image,
        image_size_anchor=cfg.vision.image_size,
        image_folder=image_folder,
        visual_prompt_style=style,
        rng=rng,
    )
    pixels, patch_valid = anyres_preprocess_host(
        image, cfg.mm_grid_pinpoints, target_size=cfg.vision.image_size
    )

    conv = templates[conv_mode].copy()
    conv.append_message(conv.roles[0], conversations[0]["value"])
    conv.append_message(conv.roles[1], None)
    ids = tokenize_with_images(conv.get_prompt(), tokenizer)
    return {
        "input_ids": np.asarray(ids, np.int64),
        "images": pixels,
        "patch_valid": patch_valid,
        "gold": conversations[1]["value"],
        "question_id": record.get("question_id", record["id"]),
        "prompt": conversations[0]["value"],
    }


def prepare_item_with_retry(
    records: List[Dict], index: int, image_folder, cfg, tokenizer, style, rng,
    max_attempts: int = 10,
) -> Dict:
    for attempt in range(max_attempts):
        try:
            return prepare_item(records[index], image_folder, cfg, tokenizer, style, rng)
        except Exception:  # noqa: BLE001 — data errors → resample (parity)
            if attempt == max_attempts - 1:
                index = rng.randint(0, len(records) - 1)
    return prepare_item(records[index], image_folder, cfg, tokenizer, style, rng)


def run_batch_beam(params, cfg, tokenizer, items: List[Dict],
                   sampling: SamplingConfig, num_beams: int):
    """Beam-search decode, one item at a time (beams ride the batch axis
    of the shared decode step — `generate.beam_search`). The reference
    reaches this through HF `model.generate(num_beams=...)`."""
    import jax.numpy as jnp

    from ..serve.generate import beam_search

    texts = []
    for it in items:
        toks = beam_search(
            params,
            jnp.asarray(np.asarray(it["input_ids"])[None]),
            jnp.asarray(it["images"])[None],
            jnp.asarray(it["patch_valid"])[None],
            cfg,
            num_beams=num_beams,
            max_new_tokens=sampling.max_new_tokens,
            eos_token_id=sampling.eos_token_id,
        )
        texts.append(tokenizer.decode(toks, skip_special_tokens=True))
    return texts


def run_batch(params, cfg, tokenizer, items: List[Dict], sampling: SamplingConfig):
    """Pad a batch of prepared items and decode greedily."""
    import jax.numpy as jnp

    B = len(items)
    T = pad_to_bucket(max(len(it["input_ids"]) for it in items), 64, 64)
    pad_id = cfg.decoder.pad_token_id
    ids = np.full((B, T), pad_id, np.int64)
    valid = np.zeros((B, T), bool)
    for b, it in enumerate(items):
        n = len(it["input_ids"])
        ids[b, :n] = it["input_ids"]
        valid[b, :n] = True

    out = generate(
        params,
        jnp.asarray(ids),
        jnp.asarray(np.stack([it["images"] for it in items])),
        jnp.asarray(np.stack([it["patch_valid"] for it in items])),
        cfg,
        sampling,
        text_valid=jnp.asarray(valid),
    )
    texts = []
    for b in range(B):
        toks = [int(t) for t in out[b]]
        if sampling.eos_token_id in toks:
            toks = toks[: toks.index(sampling.eos_token_id)]
        texts.append(tokenizer.decode(toks, skip_special_tokens=True))
    return texts


def eval_model(args, params=None, cfg: Optional[VisZephyrConfig] = None, tokenizer=None):
    num_beams = getattr(args, "num_beams", 1)
    if params is None:
        import jax.numpy as jnp

        from ..models.builder import load_pretrained_model

        tokenizer, params, cfg, _ = load_pretrained_model(
            args.model_path, model_base=args.model_base,
            vision_tower_path=args.vision_tower, dtype=jnp.bfloat16,
        )

    with open(args.question_file) as f:
        records = json.load(f)
    records = get_chunk(records, args.num_chunks, args.chunk_idx)

    rng = random.Random(args.seed)
    sampling = SamplingConfig(
        max_new_tokens=args.max_new_tokens,
        temperature=args.temperature,
        top_p=1.0 if args.top_p is None else args.top_p,
        eos_token_id=cfg.decoder.eos_token_id,
    )

    os.makedirs(os.path.dirname(os.path.abspath(args.answers_file)), exist_ok=True)
    correct = total = 0
    with open(args.answers_file, "w") as out_f:
        for start in range(0, len(records), args.batch_size):
            batch_records = list(range(start, min(start + args.batch_size, len(records))))
            items = [
                prepare_item_with_retry(
                    records, i, args.image_folder, cfg, tokenizer,
                    args.visual_prompt_style, rng,
                )
                for i in batch_records
            ]
            outputs = (
                run_batch_beam(params, cfg, tokenizer, items, sampling,
                               num_beams)
                if num_beams > 1
                else run_batch(params, cfg, tokenizer, items, sampling)
            )
            for it, text in zip(items, outputs):
                pred = extract_answer(text)
                gold = str(it["gold"]).strip()[:1]
                total += 1
                correct += int(pred == gold)
                out_f.write(
                    json.dumps(
                        {
                            "question_id": it["question_id"],
                            "prompt": it["prompt"],
                            "text": text,
                            "extracted_answer": pred,
                            "gold_answer": gold,
                        }
                    )
                    + "\n"
                )
            if total and total % (10 * args.batch_size) < args.batch_size:
                print(f"[{total}] accuracy so far: {correct / total:.4f}", flush=True)
    print(f"final accuracy: {correct / max(total, 1):.4f} ({correct}/{total})")
    return correct, total


def build_parser():
    p = argparse.ArgumentParser(description="VCR eval")
    p.add_argument("--model-path", required=False, default="")
    p.add_argument("--model-base", default=None)
    p.add_argument("--vision-tower", default=None)
    p.add_argument("--question-file", required=True)
    p.add_argument("--image-folder", required=True)
    p.add_argument("--answers-file", default="answers.jsonl")
    p.add_argument("--visual-prompt-style", default="vcr_qa", choices=["vcr_qa", "vcr_qar"])
    p.add_argument("--num-chunks", type=int, default=1)
    p.add_argument("--chunk-idx", type=int, default=0)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--temperature", type=float, default=0.0)
    # Reference flag surface (eval_vqa.py:229-230): top_p threads into
    # sampling; num_beams > 1 runs real beam search (HF generate
    # semantics, `serve/generate.py::beam_search`).
    p.add_argument("--top-p", "--top_p", dest="top_p", type=float,
                   default=None)
    p.add_argument("--num-beams", "--num_beams", dest="num_beams", type=int,
                   default=1)
    p.add_argument("--max-new-tokens", type=int, default=16)
    p.add_argument("--seed", type=int, default=0)
    return p


if __name__ == "__main__":
    eval_model(build_parser().parse_args())
