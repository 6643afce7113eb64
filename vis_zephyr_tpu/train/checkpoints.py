"""Checkpoint save/load via orbax, with the reference's logical split.

Parity surface (`vis_zephyr/train/vis_zephyr_trainer.py:304-348`,
`train/train.py:246-300, 870-893`, SURVEY §5.4):
- Stage-1 checkpoints persist ONLY the projector ("mm_projector.bin"
  equivalent) + step metadata — cheap, frequent.
- Full checkpoints persist params (+ optionally optimizer state) for
  resume.
- `latest_checkpoint` mirrors HF's get_last_checkpoint discovery.

Under a sharded mesh, orbax saves/restores each shard from its host —
the ZeRO-3 `zero.GatheredParameters` gather dance is unnecessary.
"""

from __future__ import annotations

import json
import os
import re
from typing import Dict, Optional

import jax
import orbax.checkpoint as ocp


def _ckpt_dir(output_dir: str, step: int) -> str:
    return os.path.join(output_dir, f"checkpoint-{step}")


def save_checkpoint(
    output_dir: str,
    state: Dict,
    step: int,
    projector_only: bool = False,
    metadata: Optional[Dict] = None,
) -> str:
    """Write `checkpoint-{step}/` under output_dir."""
    path = _ckpt_dir(output_dir, step)
    os.makedirs(path, exist_ok=True)
    with ocp.StandardCheckpointer() as ckptr:
        if projector_only:
            ckptr.save(
                os.path.abspath(os.path.join(path, "projector")),
                state["params"]["projector"],
                force=True,
            )
        else:
            ckptr.save(os.path.abspath(os.path.join(path, "state")), state, force=True)
    # The orbax save above is collective (every process participates);
    # trainer_state.json is a plain file on shared storage — one writer
    # (multi-host runs would otherwise race the same path).
    if jax.process_index() == 0:
        meta = {"step": step, "projector_only": projector_only}
        meta.update(metadata or {})
        with open(os.path.join(path, "trainer_state.json"), "w") as f:
            json.dump(meta, f, indent=2)
    return path


def latest_checkpoint(output_dir: str, full_state: bool = False) -> Optional[str]:
    """Newest checkpoint dir; with `full_state=True`, the newest one that
    carries a resumable full state (skipping projector-only saves)."""
    if not os.path.isdir(output_dir):
        return None
    steps = []
    for name in os.listdir(output_dir):
        m = re.fullmatch(r"checkpoint-(\d+)", name)
        if m:
            steps.append(int(m.group(1)))
    for step in sorted(steps, reverse=True):
        path = os.path.join(output_dir, f"checkpoint-{step}")
        if not full_state or os.path.isdir(os.path.join(path, "state")):
            return path
    return None


def load_checkpoint(path: str, target_state: Dict) -> Dict:
    """Restore a full-state checkpoint into the structure of target_state."""
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(
            os.path.abspath(os.path.join(path, "state")),
            jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, target_state),
        )


def load_projector(path: str, target_projector: Dict) -> Dict:
    """Restore a projector-only checkpoint (Stage-1 resume / Stage-2 init,
    reference `train/train.py:870-893`)."""
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(
            os.path.abspath(os.path.join(path, "projector")),
            jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, target_projector),
        )


def checkpoint_meta(path: str) -> Dict:
    with open(os.path.join(path, "trainer_state.json")) as f:
        return json.load(f)
