"""Optimizer construction: AdamW with decay/no-decay × projector-LR groups,
cosine schedule with linear warmup, and stage-based parameter freezing.

Reference parity surface:
- 4 param groups (decay / no-decay × projector LR vs base LR):
  `vis_zephyr/train/vis_zephyr_trainer.py:224-302` (create_optimizer with
  `mm_projector_lr`).
- Stage-1 trains ONLY the projector (`train/train.py:817-829`); Stage-2
  freezes the projector and trains LoRA adapters (`train.py:775-787`;
  note the reference's Stage-2 projector freeze is a silent no-op typo,
  `p.require_grad`, SURVEY §2.4.6 — we implement the intended freeze).
- Cosine schedule, warmup ratio 0.03, grad clip (`script/pretrain.sh:36-41`).

Frozen parameters get `optax.set_to_zero()` — no optimizer state is
allocated for them (this is what makes Stage-1 cheap: only ~Q-Former-sized
Adam moments, like the reference's projector-only DeepSpeed groups).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import optax


@dataclasses.dataclass(frozen=True)
class OptimizerConfig:
    learning_rate: float = 2e-5
    projector_lr: Optional[float] = 2e-3  # None → use learning_rate
    weight_decay: float = 0.0
    warmup_ratio: float = 0.03
    total_steps: int = 1000
    b1: float = 0.9
    b2: float = 0.999
    eps: float = 1e-8
    max_grad_norm: float = 1.0
    schedule: str = "cosine"  # "cosine" | "constant"


def _path_str(path) -> str:
    return "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)


def is_projector(path_str: str) -> bool:
    return path_str.startswith("projector")


def no_decay(path_str: str) -> bool:
    """LayerNorm/RMSNorm scales and biases are excluded from weight decay
    (reference `vis_zephyr_trainer.py:244-270` ALL_LAYERNORM_LAYERS + bias)."""
    leaf = path_str.rsplit("/", 1)[-1]
    return (leaf in ("bias", "scale") or "queries" in path_str
            or "image_newline" in path_str)


def trainable_mask(params, stage: str):
    """Boolean pytree: which params receive gradients.

    stage "1"     → projector only (reference Stage-1 freeze).
    stage "2"     → LoRA adapter leaves only when adapters are attached
                    (the intended reference Stage-2: peft adapters with the
                    projector frozen — note the reference's projector freeze
                    is a silent typo no-op, SURVEY §2.4.6); otherwise the
                    full decoder.
    stage "full"  → everything but the (always-frozen) vision tower.
    """
    has_lora = any(
        str(getattr(path[-1], "key", "")) == "lora_a"
        for path, _ in jax.tree_util.tree_leaves_with_path(params)
    )

    def decide(path, _):
        p = _path_str(path)
        leaf = str(getattr(path[-1], "key", ""))
        if leaf == "lora_scale":
            return False
        if stage == "2" and has_lora:
            return leaf in ("lora_a", "lora_b")
        if p.startswith("vision"):
            return False
        if stage == "1":
            return is_projector(p)
        if stage == "2":
            return not is_projector(p)
        return True

    return jax.tree_util.tree_map_with_path(decide, params)


def _make_schedule(cfg: OptimizerConfig, lr: float) -> optax.Schedule:
    warmup = max(1, int(cfg.total_steps * cfg.warmup_ratio))
    # Start at the step-1 warmup value, not 0 — a literal 0 would make the
    # first optimizer step a no-op (optax evaluates the schedule at count 0).
    init = lr / warmup
    if cfg.schedule == "constant":
        return optax.schedules.join_schedules(
            [optax.schedules.linear_schedule(init, lr, warmup),
             optax.schedules.constant_schedule(lr)],
            [warmup],
        )
    return optax.schedules.warmup_cosine_decay_schedule(
        init_value=init, peak_value=lr, warmup_steps=warmup,
        decay_steps=max(cfg.total_steps, warmup + 1), end_value=0.0,
    )


def learning_rates_at(opt_cfg: OptimizerConfig, step: int) -> dict:
    """Schedule values at `step` for experiment logging (base + projector
    groups), matching what the optimizer actually applies."""
    base = float(_make_schedule(opt_cfg, opt_cfg.learning_rate)(step))
    proj_peak = opt_cfg.projector_lr if opt_cfg.projector_lr is not None else opt_cfg.learning_rate
    proj = float(_make_schedule(opt_cfg, proj_peak)(step))
    return {"lr": base, "projector_lr": proj}


def build_optimizer(params, opt_cfg: OptimizerConfig, stage: str = "1") -> optax.GradientTransformation:
    """AdamW with the reference's four parameter groups + freezing."""
    mask = trainable_mask(params, stage)

    def label_fn(params):
        def decide(path, leaf):
            p = _path_str(path)
            node = mask  # walk the mask pytree along the same path
            for part in path:
                node = node[getattr(part, "key", getattr(part, "idx", None))]
            if not node:
                return "frozen"
            group = "projector" if is_projector(p) else "base"
            decay = "no_decay" if no_decay(p) else "decay"
            return f"{group}_{decay}"

        return jax.tree_util.tree_map_with_path(decide, params)

    proj_lr = opt_cfg.projector_lr if opt_cfg.projector_lr is not None else opt_cfg.learning_rate

    def adamw(lr, wd):
        return optax.adamw(
            _make_schedule(opt_cfg, lr),
            b1=opt_cfg.b1, b2=opt_cfg.b2, eps=opt_cfg.eps, weight_decay=wd,
        )

    transforms = {
        "projector_decay": adamw(proj_lr, opt_cfg.weight_decay),
        "projector_no_decay": adamw(proj_lr, 0.0),
        "base_decay": adamw(opt_cfg.learning_rate, opt_cfg.weight_decay),
        "base_no_decay": adamw(opt_cfg.learning_rate, 0.0),
        "frozen": optax.set_to_zero(),
    }
    tx = optax.multi_transform(transforms, label_fn)
    if opt_cfg.max_grad_norm:
        # Zero frozen-group grads BEFORE the global-norm clip so the clip
        # norm covers only trainable params (the reference clips only
        # requires_grad params); otherwise stage-1's full-decoder gradient
        # would inflate the norm and silently over-clip the projector.
        def _zero_frozen(updates, params=None):
            del params
            return jax.tree_util.tree_map(
                lambda m, g: g if m else jax.numpy.zeros_like(g), mask, updates
            )

        tx = optax.chain(
            optax.stateless(_zero_frozen),
            optax.clip_by_global_norm(opt_cfg.max_grad_norm),
            tx,
        )
    return tx
