"""Training entry point: two-stage multimodal training on a TPU mesh.

Reference surface: `vis_zephyr/train/train.py:729-957` (`train()`), driven
by `script/pretrain.sh` / `script/finetune.sh`. Capabilities mirrored:
- Stage 1 "pretrain": frozen tower + decoder, Q-Former projector trains
  (projector LR, cosine schedule, warmup 0.03),
- Stage 2 "finetune": LoRA adapters on decoder linears, everything else
  frozen,
- modality-grouped length sampler, bucket-padded collation,
- projector-only checkpoints each save interval + resume from the latest
  checkpoint (`train.py:870-893`),
- per-run throughput instrumentation appended to benchmark.csv
  (`train.py:856-927`).

TPU-native execution: one pjit-compiled train step over a data×fsdp(×tp)
mesh; ZeRO-equivalence comes from the parameter shardings, remat from
`jax.checkpoint` in the decoder scan.
"""

from __future__ import annotations

import argparse
import csv
import dataclasses
import os
import time
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..config import VisZephyrConfig
from ..data.dataset import Collator, DataConfig, LengthGroupedSampler, SupervisedDataset
from ..models.vis_zephyr import init_vis_zephyr
from ..parallel.mesh import create_mesh
from ..parallel.sharding import shard_batch, shard_params
from .checkpoints import latest_checkpoint, load_checkpoint, save_checkpoint
from .lora import LoraConfig, add_lora
from .optimizer import OptimizerConfig, build_optimizer, trainable_mask
from .steps import init_train_state, make_train_step


@dataclasses.dataclass
class TrainArguments:
    # Stage/model
    stage: str = "1"                      # "1" projector pretrain | "2" LoRA finetune
    model_path: str = ""                  # init checkpoint dir (optional)
    pretrain_mm_mlp_adapter: str = ""     # projector-only ckpt to load for stage 2
    lora_r: int = 128
    lora_alpha: int = 256
    lora_dropout: float = 0.05            # reference script/finetune.sh
    # Data
    data_path: str = ""
    image_folder: str = ""
    image_aspect_ratio: str = "anyres"
    mm_grid_pinpoints: str = "[[336, 672], [672, 336], [336, 1008], [1008, 336]]"
    mm_projector_type: str = "qformer"    # qformer | mlp2x_gelu
    mm_patch_merge_type: str = "flat"     # flat | spatial | spatial_unpad
    mm_use_im_start_end: bool = False
    mm_use_im_patch_token: bool = False
    model_max_length: int = 2048
    group_by_modality_length: bool = True
    # Optimization
    learning_rate: float = 2e-5
    mm_projector_lr: Optional[float] = 2e-3
    weight_decay: float = 0.0
    warmup_ratio: float = 0.03
    num_epochs: int = 1
    per_device_batch_size: int = 16
    # Reference Stage-2 recipe: per-GPU bs 4 × gradient_accumulation_steps 4
    # (`script/finetune.sh`) — accumulate N micro-batch grads per optimizer
    # step so the effective-batch recipe fits memory-tight chips.
    grad_accum_steps: int = 1
    max_steps: Optional[int] = None       # optimizer steps (HF semantics)
    max_grad_norm: float = 1.0
    seed: int = 42
    remat: bool = True
    # Mesh
    mesh_data: int = 1
    mesh_fsdp: int = 0                    # 0 = all devices
    mesh_model: int = 1
    # Output
    output_dir: str = "./checkpoints/run"
    save_steps: int = 500
    logging_steps: int = 1
    resume: bool = True
    dtype: str = "bfloat16"
    # Experiment reporting: every-step structured metrics, replacing the
    # reference's wandb stream (`script/pretrain.sh:42,48` report_to wandb).
    report_to: str = "jsonl"              # "jsonl" | "none"
    metrics_path: str = ""                # default: <output_dir>/metrics.jsonl


def build_components(args: TrainArguments, tokenizer, cfg: Optional[VisZephyrConfig] = None):
    """Construct (cfg, params, dataset, collator) for a run."""
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    if args.model_path:
        from ..models.builder import load_pretrained_model

        _, params, cfg, _ = load_pretrained_model(args.model_path, dtype=dtype)
    else:
        cfg = cfg or VisZephyrConfig(
            image_aspect_ratio=args.image_aspect_ratio,
            mm_grid_pinpoints=args.mm_grid_pinpoints,
            mm_projector_type=args.mm_projector_type,
            mm_patch_merge_type=args.mm_patch_merge_type,
            tokenizer_model_max_length=args.model_max_length,
        )
        params = init_vis_zephyr(cfg, jax.random.PRNGKey(args.seed), dtype=dtype)
    if args.pretrain_mm_mlp_adapter:
        from .checkpoints import load_projector

        params["projector"] = load_projector(args.pretrain_mm_mlp_adapter, params["projector"])
    if args.mm_use_im_start_end or args.mm_use_im_patch_token:
        from ..models.vis_zephyr import initialize_vision_tokenizer

        params, _ = initialize_vision_tokenizer(
            params, tokenizer,
            mm_use_im_patch_token=args.mm_use_im_patch_token,
            mm_use_im_start_end=args.mm_use_im_start_end,
        )
        cfg = dataclasses.replace(
            cfg,
            mm_use_im_start_end=args.mm_use_im_start_end,
            mm_use_im_patch_token=args.mm_use_im_patch_token,
        )
    if args.stage == "2":
        params = add_lora(
            params, LoraConfig(r=args.lora_r, alpha=args.lora_alpha),
            jax.random.PRNGKey(args.seed + 1), dtype=dtype,
        )

    data_cfg = DataConfig(
        data_path=args.data_path,
        image_folder=args.image_folder,
        image_aspect_ratio=args.image_aspect_ratio,
        mm_grid_pinpoints=args.mm_grid_pinpoints,
        image_size=cfg.vision.image_size,
        mm_patch_merge_type=cfg.mm_patch_merge_type,
        vision_patch_size=cfg.vision.patch_size,
        seed=args.seed,
    )
    dataset = SupervisedDataset(data_cfg, tokenizer)
    collator = Collator(
        pad_token_id=cfg.decoder.pad_token_id, max_length=args.model_max_length
    )
    return cfg, params, dataset, collator


def train(args: TrainArguments, tokenizer, cfg: Optional[VisZephyrConfig] = None):
    from ..parallel import distributed

    distributed.ensure_initialized()
    cfg, params, dataset, collator = build_components(args, tokenizer, cfg)

    n_proc = jax.process_count()
    n_dev = len(jax.devices())
    if n_proc > 1:
        # Multi-host: outermost dcn axis (pure DP) spans processes; the
        # requested data/fsdp/model layout applies per host.
        from ..parallel.mesh import create_multihost_mesh

        per_host = n_dev // n_proc
        fsdp = args.mesh_fsdp or max(
            1, per_host // (args.mesh_data * args.mesh_model)
        )
        mesh = create_multihost_mesh(
            dcn=n_proc, data=args.mesh_data, fsdp=fsdp, model=args.mesh_model
        )
        dp = n_proc * args.mesh_data * fsdp
    else:
        fsdp = args.mesh_fsdp or max(1, n_dev // (args.mesh_data * args.mesh_model))
        mesh = create_mesh(data=args.mesh_data, fsdp=fsdp, model=args.mesh_model)
        dp = args.mesh_data * fsdp
    global_batch = args.per_device_batch_size * dp
    accum = max(1, args.grad_accum_steps)

    # Optimizer-step accounting (HF semantics): max_steps / save_steps /
    # logging_steps / the LR schedule all count optimizer steps; the loop
    # below consumes `accum` micro-batches per optimizer step.
    steps_per_epoch = max(1, len(dataset) // (global_batch * accum))
    total_steps = args.max_steps or steps_per_epoch * args.num_epochs
    total_micro = total_steps * accum

    opt_cfg = OptimizerConfig(
        learning_rate=args.learning_rate,
        projector_lr=args.mm_projector_lr,
        weight_decay=args.weight_decay,
        warmup_ratio=args.warmup_ratio,
        total_steps=total_steps,
        max_grad_norm=args.max_grad_norm,
    )
    tx = build_optimizer(params, opt_cfg, stage=args.stage)
    if accum > 1:
        # Mean-of-means over micro-batches, applied every `accum` calls —
        # the inner tx (and its LR schedule) advances once per optimizer
        # step, exactly like the reference's DeepSpeed accumulation.
        import optax

        tx = optax.MultiSteps(tx, every_k_schedule=accum)
    trainable = trainable_mask(params, args.stage)
    train_step = jax.jit(make_train_step(
        cfg, tx, remat=args.remat, trainable=trainable,
        lora_dropout=args.lora_dropout if args.stage == "2" else 0.0,
        dropout_seed=args.seed,
    ))

    with jax.set_mesh(mesh):
        params = shard_params(params, mesh)
        state = init_train_state(params, tx)

        start_step = 0
        if args.resume:
            last = latest_checkpoint(args.output_dir, full_state=True)
            if last:
                state = load_checkpoint(last, state)
                start_step = int(jax.device_get(state["step"]))
                print(f"resumed from {last} at step {start_step}")

        sampler = LengthGroupedSampler(
            dataset.modality_lengths if args.group_by_modality_length else dataset.lengths,
            batch_size=args.per_device_batch_size,
            # Megabatch spans one OPTIMIZER step's samples: world × accum
            # (reference sampler multiplies world_size × grad_accum,
            # `train/vis_zephyr_trainer.py:215`).
            world_size=dp * accum,
            group_by_modality=args.group_by_modality_length,
            seed=args.seed,
        )

        # Preemption safety: TPU pods get evicted with SIGTERM; checkpoint
        # at the next step boundary and exit cleanly so `--resume` continues
        # without losing work (net-new vs the reference, whose DeepSpeed run
        # dies where it stands).
        import signal

        preempted = {"flag": False, "agreed": False}

        def _on_sigterm(signum, frame):  # noqa: ARG001
            preempted["flag"] = True

        try:
            prev_handler = signal.signal(signal.SIGTERM, _on_sigterm)
        except ValueError:  # non-main thread (tests drive train() directly)
            prev_handler = None

        run_t0 = time.perf_counter()
        seen_samples = 0
        step = start_step
        losses = []
        window_metrics = []  # last `accum` micro-steps' (loss, grad_norm)
        from ..data import prefetch as _prefetch
        from ..utils.metrics import MetricsLogger
        from .optimizer import learning_rates_at

        is_main = jax.process_index() == 0
        mlogger = None
        if args.report_to == "jsonl" and is_main:
            mpath = args.metrics_path or os.path.join(args.output_dir, "metrics.jsonl")
            mlogger = MetricsLogger(mpath, echo=False)
        last_log_t = run_t0
        last_log_step = start_step

        # Data-order resume: the sampler is deterministic in (seed, epoch),
        # so skipping the batches an uninterrupted run would already have
        # consumed reproduces its exact data order (HF Trainer skip
        # semantics, reference `train/train.py:870-893`). No extra state
        # beyond the restored step counter is needed.
        to_skip = start_step
        for epoch in range(args.num_epochs):
            sampler.set_epoch(epoch)
            order = list(iter(sampler))
            batch_indices = [
                order[s : s + global_batch]
                for s in range(0, len(order) - global_batch + 1, global_batch)
            ]
            if to_skip >= len(batch_indices):
                to_skip -= len(batch_indices)
                continue
            if to_skip:
                batch_indices = batch_indices[to_skip:]
                to_skip = 0
            if n_proc > 1:
                # Elastic data loading: each host materializes only its own
                # slice of every global batch (reference: per-rank DeepSpeed
                # sampler shards); the jitted step still sees global arrays.
                sl = distributed.process_batch_slice(global_batch)
                batch_indices = [b[sl] for b in batch_indices]
            loader = _prefetch.PrefetchLoader(dataset, collator, batch_indices, num_workers=4)
            for batch in loader:
                if step >= total_micro or preempted["agreed"]:
                    break
                if n_proc > 1:
                    batch = distributed.make_global_batch(batch, mesh)
                else:
                    batch = shard_batch(
                        {k: jnp.asarray(v) for k, v in batch.items()}, mesh
                    )
                state, metrics = train_step(state, batch)
                step += 1
                seen_samples += global_batch
                opt_step, at_boundary = step // accum, step % accum == 0
                # Device scalars, no host sync: averaged over the
                # accumulation window at logging time (HF Trainer reports
                # the window mean, not the last micro-batch).
                window_metrics.append((metrics["loss"], metrics["grad_norm"]))
                if len(window_metrics) > accum:
                    window_metrics.pop(0)

                if at_boundary and opt_step % args.logging_steps == 0:
                    loss = float(np.mean(jax.device_get(
                        [m[0] for m in window_metrics])))
                    losses.append(loss)
                    if is_main:
                        print(f"step {opt_step}/{total_steps} loss {loss:.4f}", flush=True)
                    if mlogger:
                        now = time.perf_counter()
                        d_steps = max(1, step - last_log_step)
                        mlogger.log(
                            opt_step,
                            loss=loss,
                            # Mean micro-grad norm over the window (the norm
                            # of the mean grads MultiSteps applies is not
                            # separately materialized).
                            grad_norm=float(np.mean(jax.device_get(
                                [m[1] for m in window_metrics]))),
                            tokens=int(jax.device_get(metrics["tokens"])),
                            samples_per_s=round(
                                d_steps * global_batch / max(now - last_log_t, 1e-9), 3
                            ),
                            step_time_s=round((now - last_log_t) / d_steps, 4),
                            epoch=epoch,
                            **{k: round(v, 8) for k, v in
                               learning_rates_at(opt_cfg, opt_step).items()},
                        )
                        last_log_t, last_log_step = now, step
                if at_boundary and opt_step % args.save_steps == 0:
                    save_checkpoint(
                        args.output_dir, state, opt_step,
                        projector_only=(args.stage == "1"),
                        metadata={"loss": losses[-1] if losses else None},
                    )
                # SIGTERM may land on only some hosts / at different step
                # boundaries, but the checkpoint save below is a collective:
                # all hosts must agree on the flag at the SAME step or the
                # save hangs until hard eviction. `agree_flag` is an
                # allgather-OR — run it only at optimizer-step boundaries in
                # multi-host runs (a per-micro-step allgather blocks host
                # dispatch and destroys async prefetch; the boundary cadence
                # is identical on every host, so the collective stays
                # consistent and the save happens at a shared step).
                if n_proc == 1:
                    preempted["agreed"] = preempted["flag"]
                elif at_boundary:
                    preempted["agreed"] = distributed.agree_flag(preempted["flag"])
                if preempted["agreed"]:
                    # Mid-accumulation is fine: the MultiSteps state carries
                    # the partial grads and resumes exactly.
                    save_checkpoint(
                        args.output_dir, state, opt_step,
                        projector_only=False,
                        metadata={"preempted": True},
                    )
                    if is_main:
                        print(f"preempted: checkpointed at step {opt_step}", flush=True)
                    break
            if preempted["agreed"]:
                break

        # Final save: stage 1 keeps the projector artifact AND the full
        # state; stage 2 saves adapters in the full state. (Preemption
        # already checkpointed this exact step.)
        if not preempted["agreed"]:
            save_checkpoint(args.output_dir, state, step // accum, projector_only=False)
            if args.stage == "1":
                save_checkpoint(args.output_dir, state, step // accum + 1,
                                projector_only=True)

        if mlogger:
            mlogger.close()
        if prev_handler is not None:
            signal.signal(signal.SIGTERM, prev_handler)

        # benchmark.csv instrumentation (reference train.py:856-927).
        wall = time.perf_counter() - run_t0
        if is_main:
            _append_benchmark(args.output_dir, {
                "steps": step - start_step,
                "samples": seen_samples,
                "wall_s": round(wall, 2),
                "samples_per_s": round(seen_samples / max(wall, 1e-9), 3),
                "final_loss": losses[-1] if losses else None,
                "global_batch": global_batch,
                "mesh": f"dcn={n_proc},data={args.mesh_data},fsdp={fsdp},"
                        f"model={args.mesh_model}",
            })
    return state


def _append_benchmark(output_dir: str, row: dict) -> None:
    os.makedirs(output_dir, exist_ok=True)
    path = os.path.join(output_dir, "benchmark.csv")
    exists = os.path.exists(path)
    with open(path, "a", newline="") as f:
        writer = csv.DictWriter(f, fieldnames=list(row.keys()))
        if not exists:
            writer.writeheader()
        writer.writerow(row)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Vis-Zephyr TPU trainer")
    # Fields whose default is None still need a numeric caster.
    optional_casters = {"max_steps": int, "mm_projector_lr": float}
    for field in dataclasses.fields(TrainArguments):
        name = "--" + field.name.replace("_", "-")
        if isinstance(field.default, bool):
            p.add_argument(name, type=lambda s: s.lower() in ("1", "true", "yes"),
                           default=field.default)
        elif field.name in optional_casters:
            p.add_argument(name, type=optional_casters[field.name], default=field.default)
        else:
            caster = str
            if isinstance(field.default, int):
                caster = int
            elif isinstance(field.default, float):
                caster = float
            p.add_argument(name, type=caster, default=field.default)
    p.add_argument("--tokenizer-path", default="")
    return p


def main(argv=None):
    ns = build_parser().parse_args(argv)
    tok_path = ns.tokenizer_path
    kwargs = {f.name: getattr(ns, f.name) for f in dataclasses.fields(TrainArguments)}
    args = TrainArguments(**kwargs)

    from transformers import AutoTokenizer

    tokenizer = AutoTokenizer.from_pretrained(tok_path or args.model_path)
    train(args, tokenizer)


if __name__ == "__main__":
    main()
