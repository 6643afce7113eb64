"""Training: loss/step functions, optimizer groups, stage freezing, LoRA,
checkpointing. pjit + FSDP sharding replaces DeepSpeed ZeRO (SURVEY §2.3)."""
