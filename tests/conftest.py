"""Test configuration: force an 8-device virtual CPU mesh so all sharding /
pjit paths are exercised without TPU hardware (the standard JAX trick)."""

import os

# Must be set before jax initializes its backends. Force CPU: the session
# env may pin JAX_PLATFORMS to a (single-chip, tunneled) TPU, but tests need
# the 8-device virtual CPU mesh and fast iteration.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_cpu_collective_call_terminate_timeout_seconds" not in flags:
    # XLA CPU collectives ABORT the process ("Termination timeout ...
    # exceeded. Exiting to ensure a consistent program state") when the 8
    # virtual devices' threads miss the rendezvous deadline — which happens
    # under host CPU starvation (e.g. suites running concurrently), not
    # from any real deadlock. Give the rendezvous room to be slow.
    flags += (" --xla_cpu_collective_call_warn_stuck_timeout_seconds=120"
              " --xla_cpu_collective_call_terminate_timeout_seconds=1200")
os.environ["XLA_FLAGS"] = flags

import jax  # noqa: E402

# A sitecustomize hook may have force-registered a tunneled TPU backend via
# jax.config.update("jax_platforms", ...), which outranks the env var —
# counter-update before any backend is instantiated.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


class MockTokenizer:
    """A deterministic whitespace tokenizer with HF-ish surface, for tests.

    Splits text into words and maps each word to a stable id. Prepends BOS
    like sentencepiece tokenizers do. NOT linguistically meaningful — just
    enough structure to exercise splicing / masking logic.
    """

    bos_token_id = 1
    eos_token_id = 2
    pad_token_id = 0
    model_max_length = 4096

    def __init__(self):
        self.vocab = {"<s>": 1, "</s>": 2, "<pad>": 0}

    def _word_id(self, word):
        if word not in self.vocab:
            self.vocab[word] = len(self.vocab) + 10
        return self.vocab[word]

    class _Out:
        def __init__(self, ids):
            self.input_ids = ids

    def __call__(self, text, **kwargs):
        # Split on whitespace but keep "</s>" attached tokens separate.
        pieces = []
        for token in text.replace("</s>", " </s> ").split():
            pieces.append(token)
        ids = [self.bos_token_id] + [self._word_id(p) for p in pieces]
        return self._Out(ids)

    def decode(self, ids, skip_special_tokens=False):
        rev = {v: k for k, v in self.vocab.items()}
        words = [rev.get(i, f"<unk{i}>") for i in ids]
        if skip_special_tokens:
            words = [w for w in words if w not in ("<s>", "</s>", "<pad>")]
        return " ".join(words)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Drop jit/compile caches (and force a gc) at every module boundary.

    The full suite compiles hundreds of distinct executables in one
    process; with the accumulated compiler state the XLA:CPU backend has
    been observed to SEGFAULT inside backend_compile_and_load on a graph
    that compiles fine in a fresh process (reproduced twice at the same
    test, tests/test_paged_batching.py::..::test_budget_edges_..., at
    ~45% of the suite). Shedding caches between modules keeps the
    per-process compiler footprint bounded; within-module caching — the
    part that matters for runtime — is untouched."""
    yield
    import gc

    jax.clear_caches()
    gc.collect()


@pytest.fixture
def mock_tokenizer():
    return MockTokenizer()


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def pytest_sessionfinish(session, exitstatus):
    """Name any non-daemon threads still alive at teardown — a leak here
    hangs interpreter exit (CI deadlock), so make it visible immediately."""
    import threading

    leaked = [
        t for t in threading.enumerate()
        if t is not threading.main_thread() and not t.daemon and t.is_alive()
    ]
    if leaked:
        print(f"\n[conftest] non-daemon threads alive at exit: "
              f"{[t.name for t in leaked]}", flush=True)
