"""Interactive single-image chat CLI.

Reference surface: `python -m vis_zephyr.serve.cli --model-path ...
--image-file ...` (`vis_zephyr/serve/cli.py:27-213`): load model →
preprocess the image once → loop reading user turns → stream the reply.
"""

from __future__ import annotations

import argparse

import jax.numpy as jnp

from ..models.builder import load_pretrained_model
from .engine import ChatEngine


def load_image(image_file: str):
    from PIL import Image

    if image_file.startswith(("http://", "https://")):
        import io
        import urllib.request

        with urllib.request.urlopen(image_file) as r:
            return Image.open(io.BytesIO(r.read())).convert("RGB")
    return Image.open(image_file).convert("RGB")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Vis-Zephyr TPU chat CLI")
    p.add_argument("--model-path", required=True)
    p.add_argument("--model-base", default=None)
    p.add_argument("--vision-tower", default=None)
    p.add_argument("--image-file", required=True)
    p.add_argument("--conv-mode", default="zephyr_v1")
    p.add_argument("--temperature", type=float, default=0.0)
    p.add_argument("--max-new-tokens", type=int, default=512)
    p.add_argument("--load-8bit", action="store_true")
    p.add_argument("--load-4bit", action="store_true")
    p.add_argument("--lookahead", type=int, default=0,
                   help="prompt-lookup speculative decoding span (greedy "
                        "only; 0 disables)")
    return p


def main(args=None):
    args = build_parser().parse_args(args)
    tokenizer, params, cfg, _ = load_pretrained_model(
        args.model_path,
        model_base=args.model_base,
        vision_tower_path=args.vision_tower,
        load_8bit=args.load_8bit,
        load_4bit=args.load_4bit,
        dtype=jnp.bfloat16,
    )
    if tokenizer is None:
        raise SystemExit("could not load a tokenizer; pass --model-base or --model-path with tokenizer files")

    engine = ChatEngine(
        params, cfg, tokenizer,
        conv_mode=args.conv_mode,
        temperature=args.temperature,
        max_new_tokens=args.max_new_tokens,
        lookahead=args.lookahead,
    )
    image = load_image(args.image_file)
    first = True
    print("Loaded. Type your message (ctrl-d to exit).")
    while True:
        try:
            question = input("user: ")
        except EOFError:
            break
        if not question.strip():
            continue
        print("assistant: ", end="", flush=True)
        for chunk in engine.chat("cli", question, pil_image=image if first else None):
            print(chunk, end="", flush=True)
        print()
        first = False


if __name__ == "__main__":
    main()
