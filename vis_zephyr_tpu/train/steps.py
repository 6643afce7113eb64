"""Loss + train-step functions (pjit/jit-ready pure functions).

The train step is one XLA program: multimodal forward (vision encode,
Q-Former projection, splice, decoder with remat) → shifted cross-entropy
over non-IGNORE labels → grads → optax update. Under an fsdp-sharded mesh,
XLA emits the ZeRO-style all-gather / reduce-scatter collectives from the
parameter shardings (no explicit communication code).

Reference equivalents: the HF Trainer loop + DeepSpeed step driven from
`vis_zephyr/train/train.py:849-893`.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..config import VisZephyrConfig
from ..constants import IGNORE_INDEX
from ..models.vis_zephyr import vis_zephyr_forward


def cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Next-token CE over positions whose *target* label != IGNORE_INDEX.

    logits [B, T, V], labels [B, T] (already aligned to the spliced
    sequence). Returns (mean loss, token count).
    """
    targets = labels[:, 1:]
    preds = logits[:, :-1]
    valid = targets != IGNORE_INDEX
    safe_targets = jnp.maximum(targets, 0)
    logp = jax.nn.log_softmax(preds.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, safe_targets[..., None], axis=-1)[..., 0]
    n = jnp.maximum(valid.sum(), 1)
    return jnp.where(valid, nll, 0.0).sum() / n, valid.sum()


def loss_fn(params, batch: Dict, cfg: VisZephyrConfig, remat: bool = True,
            lora_dropout: float = 0.0, dropout_rng=None):
    logits, aux = vis_zephyr_forward(
        params,
        batch["input_ids"],
        batch.get("images"),
        batch.get("patch_valid"),
        cfg,
        text_valid=batch.get("text_valid"),
        labels=batch["labels"],
        remat=remat,
        merge_info=batch.get("merge_info"),
        lora_dropout=lora_dropout,
        dropout_rng=dropout_rng,
    )
    loss, n_tokens = cross_entropy(logits, aux["labels"])
    return loss, {"loss": loss, "tokens": n_tokens}


def make_train_step(cfg: VisZephyrConfig, tx: optax.GradientTransformation, remat: bool = True,
                    trainable=None, lora_dropout: float = 0.0, dropout_seed: int = 0):
    """Returns `train_step(state, batch) -> (state, metrics)` where
    state = {"params", "opt_state", "step"}.

    `trainable` (optional boolean pytree, from `optimizer.trainable_mask`)
    stops gradients through frozen subtrees at the source: XLA dead-code-
    eliminates their backward pass (stage 1 no longer materializes full
    decoder grads), and grad_norm / global-norm clipping then cover only
    params that actually train — matching the reference, which clips only
    requires_grad params (HF Trainer semantics).

    `lora_dropout` > 0 applies train-time dropout on each LoRA branch input
    (reference recipe 0.05, `script/finetune.sh`); the per-step rng is
    derived deterministically from `dropout_seed` and the step counter, so
    no rng threading through the caller and resumed runs replay the same
    masks. `tx` may be an `optax.MultiSteps` wrap (gradient accumulation) —
    the state pytree shape is whatever `tx.init` produced."""

    def train_step(state, batch):
        rng = (
            jax.random.fold_in(jax.random.PRNGKey(dropout_seed), state["step"])
            if lora_dropout > 0.0 else None
        )

        def masked_loss(p):
            if trainable is not None:
                p = jax.tree_util.tree_map(
                    lambda m, x: x if m else jax.lax.stop_gradient(x), trainable, p
                )
            return loss_fn(p, batch, cfg, remat=remat,
                           lora_dropout=lora_dropout, dropout_rng=rng)

        (loss, metrics), grads = jax.value_and_grad(masked_loss, has_aux=True)(
            state["params"]
        )
        updates, opt_state = tx.update(grads, state["opt_state"], state["params"])
        params = optax.apply_updates(state["params"], updates)
        new_state = {"params": params, "opt_state": opt_state, "step": state["step"] + 1}
        metrics = dict(metrics)
        metrics["grad_norm"] = optax.global_norm(grads)
        return new_state, metrics

    return train_step


def init_train_state(params, tx: optax.GradientTransformation) -> Dict:
    return {"params": params, "opt_state": tx.init(params), "step": jnp.zeros((), jnp.int32)}
