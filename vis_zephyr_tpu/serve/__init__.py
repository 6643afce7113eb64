"""Inference runtime: jitted prefill + KV-cache decode, CLI and HTTP serve."""
