"""Preemption-safe training: SIGTERM mid-run → checkpoint at the step
boundary, clean exit, `--resume` continues from the saved step (TPU pods
are evicted with SIGTERM; the reference's DeepSpeed run just dies)."""

import json
import os
import signal
import subprocess
import sys
import time

import numpy as np
import pytest

PIL = pytest.importorskip("PIL")
from PIL import Image  # noqa: E402


@pytest.fixture
def fixture_data(tmp_path):
    img_dir = tmp_path / "images"
    img_dir.mkdir()
    rng = np.random.default_rng(0)
    records = []
    for i in range(8):
        name = f"img{i}.jpg"
        Image.fromarray(
            rng.integers(0, 255, (80, 100, 3), np.uint8)
        ).save(img_dir / name)
        records.append({
            "id": f"s{i}", "image": name,
            "conversations": [
                {"from": "human", "value": f"<image>\nq {i}?"},
                {"from": "gpt", "value": f"a {i}."},
            ],
        })
    (tmp_path / "data.json").write_text(json.dumps(records))
    return tmp_path


_DRIVER = """
import sys
import jax
jax.config.update("jax_platforms", "cpu")
from tests.conftest import MockTokenizer
from vis_zephyr_tpu.config import tiny_config
from vis_zephyr_tpu.train.train import TrainArguments, train

out_dir, data_path, img_dir, max_steps = sys.argv[1:5]
cfg = tiny_config(vocab_size=50000)
args = TrainArguments(
    stage="1", data_path=data_path, image_folder=img_dir,
    image_aspect_ratio="pad", mm_grid_pinpoints=cfg.mm_grid_pinpoints,
    model_max_length=64, per_device_batch_size=1, num_epochs=50,
    max_steps=int(max_steps), save_steps=1000, logging_steps=1,
    mesh_data=1, mesh_fsdp=1, mesh_model=1,
    output_dir=out_dir, remat=False, resume=True, dtype="float32",
)
state = train(args, MockTokenizer(), cfg=cfg)
print("TRAIN_EXITED step", int(jax.device_get(state["step"])), flush=True)
"""


def test_sigterm_checkpoints_and_resumes(tmp_path, fixture_data):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = str(tmp_path / "run")
    script = tmp_path / "driver.py"
    script.write_text(_DRIVER)
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               PYTHONPATH=repo + os.pathsep + os.environ.get("PYTHONPATH", ""))

    proc = subprocess.Popen(
        [sys.executable, str(script), out_dir,
         str(fixture_data / "data.json"), str(fixture_data / "images"), "1000"],
        cwd=repo, env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True,
    )
    # Wait for training to produce at least two steps, then preempt.
    seen = []
    deadline = time.time() + 420
    while time.time() < deadline:
        line = proc.stdout.readline()
        if not line:
            time.sleep(0.1)
            continue
        seen.append(line)
        if line.startswith("step 2/"):
            break
    else:
        proc.kill()
        pytest.fail(f"never reached step 2: {''.join(seen)[-2000:]}")
    proc.send_signal(signal.SIGTERM)
    out, _ = proc.communicate(timeout=300)
    assert proc.returncode == 0, out[-2000:]
    assert "preempted: checkpointed at step" in out, out[-2000:]

    # A checkpoint exists with preempted metadata and a full state.
    from vis_zephyr_tpu.train.checkpoints import latest_checkpoint

    last = latest_checkpoint(out_dir, full_state=True)
    assert last is not None
    meta = json.loads(open(os.path.join(last, "trainer_state.json")).read())
    assert meta.get("preempted") is True
    saved_step = meta["step"]
    assert saved_step >= 2

    # Resume picks up from the preempted step and advances to completion.
    proc2 = subprocess.run(
        [sys.executable, str(script), out_dir,
         str(fixture_data / "data.json"), str(fixture_data / "images"),
         str(saved_step + 2)],
        cwd=repo, env=env, capture_output=True, text=True, timeout=420,
    )
    assert proc2.returncode == 0, proc2.stdout[-2000:] + proc2.stderr[-1000:]
    assert "resumed from" in proc2.stdout, proc2.stdout[-1500:]
    resumed_lines = [l for l in proc2.stdout.splitlines() if l.startswith("step ")]
    assert resumed_lines, proc2.stdout[-1500:]
    first_resumed = int(resumed_lines[0].split()[1].split("/")[0])
    assert first_resumed == saved_step + 1, proc2.stdout[-1500:]
    assert f"TRAIN_EXITED step {saved_step + 2}" in proc2.stdout
