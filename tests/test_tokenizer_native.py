"""Native C++ BPE tokenizer parity vs the HF fast tokenizer.

Builds a LLaMA-convention tokenizer (BPE + byte fallback, Prepend-▁ /
Replace-space normalizers — the Zephyr-7B-β layout) with the `tokenizers`
library, exports tokenizer.json, and pins the C++ encode/decode
(`native/vzt_tokenizer.cpp` via `data/tokenizer_native.py`) against HF on
ASCII, multilingual, byte-fallback and whitespace-heavy inputs.
"""

import json

import pytest

tokenizers = pytest.importorskip("tokenizers")

from tokenizers import Tokenizer, decoders, models, normalizers, trainers  # noqa: E402

from vis_zephyr_tpu.data import tokenizer_native  # noqa: E402

if not tokenizer_native.available():
    pytest.skip("native tokenizer lib unavailable (no g++)", allow_module_level=True)

CORPUS = [
    "the quick brown fox jumps over the lazy dog",
    "hello world this is a test of the tokenizer",
    "describe the picture in detail please",
    "what is the answer to the question",
    "a b c d e f g h i j k l m n o p q r s t u v w x y z",
    "zephyr mistral vision language model training",
] * 50


@pytest.fixture(scope="module")
def tok_pair(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("tok")
    tok = Tokenizer(models.BPE(unk_token="<unk>", byte_fallback=True))
    tok.normalizer = normalizers.Sequence(
        [normalizers.Prepend("▁"), normalizers.Replace(" ", "▁")]
    )
    tok.decoder = decoders.Sequence(
        [
            decoders.Replace("▁", " "),
            decoders.ByteFallback(),
            decoders.Fuse(),
            decoders.Strip(" ", 1, 0),
        ]
    )
    trainer = trainers.BpeTrainer(
        vocab_size=320, special_tokens=["<unk>", "<s>", "</s>"],
        show_progress=False,
    )
    tok.train_from_iterator(CORPUS, trainer=trainer)

    # Graft the byte-fallback rows into the model vocab (LLaMA layout).
    path = tmp / "tokenizer.json"
    tok.save(str(path))
    tj = json.loads(path.read_text())
    vocab = tj["model"]["vocab"]
    next_id = max(vocab.values()) + 1
    for b in range(256):
        name = f"<0x{b:02X}>"
        if name not in vocab:
            vocab[name] = next_id
            next_id += 1
    path.write_text(json.dumps(tj))

    hf = Tokenizer.from_file(str(path))
    native = tokenizer_native.NativeTokenizer(
        blob=tokenizer_native.convert_tokenizer_json(str(path))
    )
    return hf, native


CASES = [
    "the quick brown fox",
    "hello world",
    "zephyr model",
    "a",
    "",
    "   three leading spaces",
    "trailing spaces   ",
    "UNSEEN CAPITALS!?",          # byte fallback (capitals not in corpus)
    "héllo wörld",                # multi-byte UTF-8 → byte fallback
    "日本語のテキスト",              # CJK → byte fallback
    "emoji 🙂 test",
    "mixed 123 numbers and words",
    "the the the the the the",
]


@pytest.mark.parametrize("text", CASES)
def test_encode_matches_hf(tok_pair, text):
    hf, native = tok_pair
    expect = hf.encode(text).ids
    got = native.encode(text, add_bos=False)
    assert got == expect, (text, got, expect)


@pytest.mark.parametrize("text", CASES)
def test_decode_roundtrip_matches_hf(tok_pair, text):
    hf, native = tok_pair
    ids = hf.encode(text).ids
    assert native.decode(ids, skip_special_tokens=False) == hf.decode(ids)


def test_bos_prepended(tok_pair):
    _, native = tok_pair
    ids = native.encode("hello", add_bos=True)
    assert ids[0] == native.bos_token_id


def test_vocab_size(tok_pair):
    hf, native = tok_pair
    assert native.vocab_size == hf.get_vocab_size()
