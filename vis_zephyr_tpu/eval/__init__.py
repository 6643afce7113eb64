"""Evaluation harnesses: VCR (ViP-overlaid multiple choice) and MMBench."""
