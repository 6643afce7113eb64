"""TPU compute ops: attention (XLA reference + Pallas flash kernels),
token splicing, on-device image preprocessing."""

from .attention import dot_product_attention
