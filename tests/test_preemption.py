"""Preemption-safe training: SIGTERM → consistent mid-epoch checkpoint →
exit 0 → `--resume` continues at the saved batch.

Net-new vs the reference, which loses mid-epoch work on preemption and
recovers only via manual --resume from the last periodic save
(base_trainer.py:35-48). Driven exactly like production: a real
subprocess running the whmr-train CLI receives a real SIGTERM.
"""

import json
import os
import signal
import subprocess
import sys
import time

import pytest

TINY_MISC = [
    "--misc",
    "vit.embed_dim", "64", "vit.depth", "2", "vit.num_heads", "2",
    "deconv.num_filters", "32,32,32", "pymaf.mlp_dim", "32,16,8,4",
    "pymaf.aux_supv_on", "false",
]


def _train_cmd(log_dir, extra):
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        "from whmr_tpu.training.cli import main\n"
        f"main({extra!r})\n"
    )
    return [sys.executable, "-u", "-c", code]


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    import cv2
    import numpy as np

    root = tmp_path_factory.mktemp("preempt_ds")
    img_dir = root / "images"
    img_dir.mkdir()
    rng = np.random.RandomState(3)
    n = 32
    names = []
    for i in range(n):
        img = rng.randint(0, 255, (360, 480, 3), np.uint8)
        name = f"im_{i:03d}.png"
        cv2.imwrite(str(img_dir / name), img)
        names.append(name)
    np.savez(
        root / "labels.npz",
        imgname=np.array(names),
        center=rng.uniform(150, 300, (n, 2)).astype(np.float32),
        scale=rng.uniform(0.8, 1.5, (n,)).astype(np.float32),
        pose=(rng.randn(n, 72) * 0.2).astype(np.float32),
        shape=(rng.randn(n, 10) * 0.3).astype(np.float32),
        has_smpl=np.ones(n, np.float32),
        S=np.concatenate(
            [rng.randn(n, 24, 3) * 0.3, np.ones((n, 24, 1))], -1
        ).astype(np.float32),
        part=np.concatenate(
            [rng.uniform(100, 400, (n, 24, 2)), np.ones((n, 24, 1))], -1
        ).astype(np.float32),
        openpose=np.zeros((n, 25, 3), np.float32),
    )
    return root


class TestPreemption:
    def test_sigterm_saves_and_resume_continues(self, dataset, tmp_path):
        env = dict(os.environ)
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
        log_root = str(tmp_path / "runs")
        args = [
            "--train_npz", str(dataset / "labels.npz"),
            "--img_dir", str(dataset / "images"),
            "--log_dir", log_root, "--name", "preempt",
            "--batch_size", "8", "--num_epochs", "1",
            "--steps_per_epoch", "100000", "--log_every", "1",
        ] + TINY_MISC
        run_dir = os.path.join(log_root, "preempt")
        metrics = os.path.join(run_dir, "metrics.jsonl")

        proc = subprocess.Popen(
            _train_cmd(run_dir, args), env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        try:
            # wait until at least one step has logged (model compiled and
            # training is really in the loop), then preempt
            deadline = time.time() + 600
            while time.time() < deadline:
                if os.path.exists(metrics) and os.path.getsize(metrics) > 0:
                    break
                if proc.poll() is not None:
                    out = proc.stdout.read()
                    raise AssertionError(f"trainer died early:\n{out[-3000:]}")
                time.sleep(1.0)
            else:
                raise AssertionError("no training step within deadline")
            proc.send_signal(signal.SIGTERM)
            out, _ = proc.communicate(timeout=300)
        finally:
            if proc.poll() is None:
                proc.kill()
                proc.wait()

        assert proc.returncode == 0, out[-3000:]
        assert "preempted: checkpoint saved" in out, out[-3000:]
        ckpt_dir = os.path.join(run_dir, "checkpoints")
        assert os.path.isdir(ckpt_dir) and os.listdir(ckpt_dir)

        # the saved batch_idx must be a real mid-epoch position
        with open(metrics) as f:
            steps_logged = sum(1 for _ in f)
        assert steps_logged >= 1

        # resume: picks up epoch/batch from the preemption checkpoint
        resume_args = args[:args.index("--steps_per_epoch") + 2]
        resume_args[resume_args.index("--steps_per_epoch") + 1] = "1"
        resume_args += ["--log_every", "1", "--resume"] + TINY_MISC
        out2 = subprocess.run(
            _train_cmd(run_dir, resume_args), env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            timeout=900,
        )
        assert out2.returncode == 0, out2.stdout[-3000:]
        assert "resumed from step" in out2.stdout, out2.stdout[-3000:]


class TestPreemptOnSaveBoundary:
    def test_no_double_save_when_periodic_save_hit_same_step(self, tmp_path):
        """SIGTERM landing on a --save_every boundary must not save the
        same orbax step twice (StepAlreadyExistsError would turn the
        documented exit-0 into a crash)."""
        import jax
        import numpy as np

        from whmr_tpu.training.trainer import Trainer
        from whmr_tpu.utils.testing import make_example_train_batch, tiny_config

        cfg = tiny_config()
        from dataclasses import replace

        cfg = replace(cfg, train=replace(cfg.train, batch_size=8),
                      pymaf=replace(cfg.pymaf, aux_supv_on=False))
        tr = Trainer(cfg, log_dir=str(tmp_path / "run"), aux_rendering=False)

        batch = make_example_train_batch(cfg, 8)

        def loader():
            while True:
                yield {k: np.asarray(v) for k, v in batch.items()}

        # preempt DURING the first batch: flag set before the loop checks
        tr._preempted = True
        with pytest.raises(SystemExit) as e:
            tr.train_epoch(loader(), log_every=0, save_every=1)
        assert e.value.code == 0
        # exactly one checkpoint step written, loadable
        assert tr.ckpt.restore(template={
            "params": tr.state.params, "batch_stats": tr.state.batch_stats,
            "opt_state": tr.state.opt_state,
            "step": np.zeros((), np.int32), "epoch": 0, "batch_idx": 0,
        }) is not None
