"""End-to-end training loop test: stage-1 run on the synthetic fixture set
over the 8-device virtual mesh, with checkpoint + resume."""

import json

import numpy as np
import pytest

PIL = pytest.importorskip("PIL")
from PIL import Image  # noqa: E402

import jax  # noqa: E402

from vis_zephyr_tpu.config import tiny_config  # noqa: E402
from vis_zephyr_tpu.train.checkpoints import latest_checkpoint  # noqa: E402
from vis_zephyr_tpu.train.train import TrainArguments, train  # noqa: E402


@pytest.fixture
def fixture_data(tmp_path):
    img_dir = tmp_path / "images"
    img_dir.mkdir()
    rng = np.random.default_rng(0)
    records = []
    for i in range(8):
        name = f"img{i}.jpg"
        Image.fromarray(rng.integers(0, 255, (80 + 10 * i, 100, 3), np.uint8)).save(img_dir / name)
        records.append(
            {
                "id": f"sample-{i}",
                "image": name,
                "conversations": [
                    {"from": "human", "value": f"<image>\nQuestion number {i}?"},
                    {"from": "gpt", "value": f"Answer number {i} with several words."},
                ],
            }
        )
    data_path = tmp_path / "data.json"
    data_path.write_text(json.dumps(records))
    return str(data_path), str(img_dir)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_stage1_train_run_and_resume(tmp_path, fixture_data, mock_tokenizer):
    data_path, img_dir = fixture_data
    cfg = tiny_config(vocab_size=50000)
    args = TrainArguments(
        stage="1",
        data_path=data_path,
        image_folder=img_dir,
        image_aspect_ratio="anyres",
        mm_grid_pinpoints=cfg.mm_grid_pinpoints,
        model_max_length=128,
        per_device_batch_size=1,
        num_epochs=2,
        max_steps=2,
        learning_rate=1e-3,
        mm_projector_lr=1e-2,
        mesh_data=1,
        mesh_fsdp=4,
        mesh_model=2,
        output_dir=str(tmp_path / "run"),
        save_steps=1,
        logging_steps=1,
        remat=True,
        resume=False,
    )
    from vis_zephyr_tpu.data import prefetch as prefetch_mod

    consumed: list = []
    real_loader = prefetch_mod.PrefetchLoader

    class RecordingLoader(real_loader):
        def __init__(self, dataset, collator, batch_indices, **kw):
            consumed.extend(batch_indices)
            super().__init__(dataset, collator, batch_indices, **kw)

    prefetch_mod.PrefetchLoader = RecordingLoader
    try:
        state = train(args, mock_tokenizer, cfg=cfg)
        assert int(jax.device_get(state["step"])) == 2

        last = latest_checkpoint(args.output_dir)
        assert last is not None

        first_run_batches = list(consumed)
        consumed.clear()

        # Resume continues from the saved full-state checkpoint AND
        # fast-forwards the sampler: the next batch equals what an
        # uninterrupted run would have consumed next (no data replay).
        args2 = TrainArguments(**{**args.__dict__, "max_steps": 3, "resume": True})
        state2 = train(args2, mock_tokenizer, cfg=cfg)
        assert int(jax.device_get(state2["step"])) == 3
        assert consumed, "resumed run consumed no batches"
        assert consumed[0] == first_run_batches[2], (
            f"resume replayed data: got {consumed[0]}, "
            f"expected step-3 batch {first_run_batches[2]}"
        )
    finally:
        prefetch_mod.PrefetchLoader = real_loader

    # benchmark.csv written.
    bench = (tmp_path / "run" / "benchmark.csv").read_text()
    assert "samples_per_s" in bench

    # Experiment reporting: one JSONL row per logged step with the full
    # metric set (reference streams these to wandb, `script/pretrain.sh:42`).
    rows = [
        json.loads(line)
        for line in (tmp_path / "run" / "metrics.jsonl").read_text().splitlines()
    ]
    assert len(rows) >= 2
    for row in rows:
        for key in ("step", "loss", "grad_norm", "tokens", "samples_per_s",
                    "step_time_s", "lr", "projector_lr", "epoch"):
            assert key in row, f"missing metric {key}"
    assert rows[0]["step"] == 1 and np.isfinite(rows[0]["loss"])
    # Warmup schedule: projector LR group is above the base group.
    assert rows[0]["projector_lr"] > rows[0]["lr"]


def test_grad_accum_matches_big_batch(rng):
    """VERDICT r2 #3: N accumulated micro-steps must produce the SAME
    update as one N×batch step (equal per-micro-batch token counts, so
    mean-of-means == global mean — the reference's HF/DeepSpeed
    accumulation semantics)."""
    import jax.numpy as jnp
    import optax

    from vis_zephyr_tpu.config import tiny_config
    from vis_zephyr_tpu.models.vis_zephyr import init_vis_zephyr
    from vis_zephyr_tpu.train.steps import init_train_state, make_train_step

    cfg = tiny_config()
    params = init_vis_zephyr(cfg, jax.random.PRNGKey(0))

    def batch(seed, B=2, T=8):
        r = np.random.default_rng(seed)
        return {
            "input_ids": jnp.asarray(r.integers(5, cfg.decoder.vocab_size, (B, T))),
            "labels": jnp.asarray(r.integers(5, cfg.decoder.vocab_size, (B, T))),
        }

    micro1, micro2 = batch(1), batch(2)
    big = {k: jnp.concatenate([micro1[k], micro2[k]], axis=0) for k in micro1}

    inner = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(1e-2))

    # Accumulated: two micro-steps through MultiSteps(k=2).
    tx_acc = optax.MultiSteps(inner, every_k_schedule=2)
    step_acc = jax.jit(make_train_step(cfg, tx_acc, remat=False))
    state = init_train_state(params, tx_acc)
    state, m1 = step_acc(state, micro1)
    # Mid-accumulation: params must be UNCHANGED (updates are all-zero).
    np.testing.assert_array_equal(
        np.asarray(state["params"]["decoder"]["lm_head"]["kernel"]),
        np.asarray(params["decoder"]["lm_head"]["kernel"]),
    )
    state, m2 = step_acc(state, micro2)

    # One big-batch step.
    tx_big = inner
    step_big = jax.jit(make_train_step(cfg, tx_big, remat=False))
    state_big = init_train_state(params, tx_big)
    state_big, mb = step_big(state_big, big)

    # Same final params (same optimizer update).
    ja, jb = state["params"], state_big["params"]
    # atol relative to the lr=1e-2 update magnitude: adam's g/√v̂ amplifies
    # f32 summation-order noise where a grad entry is ~0.
    for pa, pb in zip(jax.tree_util.tree_leaves(ja), jax.tree_util.tree_leaves(jb)):
        np.testing.assert_allclose(np.asarray(pa), np.asarray(pb), rtol=1e-3, atol=1e-4)
    # Mean-of-means == big-batch mean loss (equal token counts).
    np.testing.assert_allclose(
        (float(m1["loss"]) + float(m2["loss"])) / 2, float(mb["loss"]), rtol=1e-5
    )
