"""Trainer loop + checkpoint lifecycle tests (synthetic data, tiny model)."""

import os

import jax
import numpy as np
import pytest

from whmr_tpu.training.trainer import Trainer
from whmr_tpu.utils.testing import make_example_train_batch, tiny_config


def batch_iter(cfg, n_batches=2, batch=8):
    for i in range(n_batches):
        yield make_example_train_batch(cfg, batch, seed=i)


class TestTrainer:
    def test_load_pretrained_torch_backbone(self, tmp_path):
        """whmr-train --pretrained workflow: a torch state_dict (here the
        bare-backbone form of vitpose-b-multi-coco.pth) initializes the
        encoder weights in place; heads keep their fresh init and the
        optimizer stays untouched (reference pose_vit.py:21 +
        base_trainer.load_pretrained)."""
        import torch

        from whmr_tpu.utils.convert import synthetic_reference_state_dict
        from whmr_tpu.utils.convert import t_linear

        cfg = tiny_config()
        sd = synthetic_reference_state_dict(cfg, seed=7)
        bare = {
            k.replace("feature_extractor.", ""): torch.from_numpy(np.asarray(v))
            for k, v in sd.items()
            if k.startswith("feature_extractor.")
        }
        pt = tmp_path / "vitpose_backbone.pth"
        torch.save({"state_dict": bare}, str(pt))

        trainer = Trainer(cfg, str(tmp_path / "runP"), aux_rendering=False)
        head_before = np.asarray(
            jax.tree_util.tree_leaves(trainer.state.params["regressor0"])[0]
        )
        n = trainer.load_pretrained(str(pt))
        assert n > 0
        got = np.asarray(
            trainer.state.params["feature_extractor"]["block0"]["attn"]["qkv"]["kernel"]
        )
        want = t_linear(np.asarray(bare["backbone.blocks.0.attn.qkv.weight"]))
        np.testing.assert_allclose(got, want, atol=1e-6)
        # heads untouched
        head_after = np.asarray(
            jax.tree_util.tree_leaves(trainer.state.params["regressor0"])[0]
        )
        np.testing.assert_array_equal(head_before, head_after)
        # training still steps with the merged weights
        trainer.train_epoch(batch_iter(cfg, 1, 8), log_every=100)
        assert int(trainer.state.step) == 1

    def test_load_pretrained_orbax_dir(self, tmp_path):
        """whmr-train --pretrained with an orbax checkpoint DIR (the
        whmr-convert output form): the saved payload has six top-level keys,
        so the restore must be template-free — a partial {params,
        batch_stats} template makes orbax raise (round-3 review finding,
        reproduced)."""
        cfg = tiny_config()
        src = Trainer(cfg, str(tmp_path / "src"), aux_rendering=False)
        src.train_epoch(batch_iter(cfg, 1, 8), log_every=100)
        src.save()
        src_qkv = np.asarray(
            src.state.params["feature_extractor"]["block0"]["attn"]["qkv"]["kernel"]
        )

        dst = Trainer(cfg, str(tmp_path / "dst"), aux_rendering=False)
        n = dst.load_pretrained(os.path.join(str(tmp_path / "src"), "checkpoints"))
        assert n > 0
        got = np.asarray(
            dst.state.params["feature_extractor"]["block0"]["attn"]["qkv"]["kernel"]
        )
        np.testing.assert_allclose(got, src_qkv, atol=1e-6)
        # optimizer/step start fresh (warm start, not resume)
        assert int(dst.state.step) == 0
        dst.train_epoch(batch_iter(cfg, 1, 8), log_every=100)
        assert int(dst.state.step) == 1

    def test_epoch_and_checkpoint_roundtrip(self, tmp_path):
        cfg = tiny_config()
        trainer = Trainer(cfg, str(tmp_path / "run"), aux_rendering=False)
        last = trainer.train_epoch(batch_iter(cfg), log_every=1)
        assert np.isfinite(last["loss"])
        assert int(trainer.state.step) == 2
        trainer.save(metric=last["loss"])

        # metrics were written
        assert os.path.exists(trainer.metrics.path)
        with open(trainer.metrics.path) as f:
            lines = f.readlines()
        assert len(lines) >= 1

        # fresh trainer resumes state
        trainer2 = Trainer(cfg, str(tmp_path / "run"), aux_rendering=False)
        assert trainer2.resume()
        assert int(trainer2.state.step) == 2
        p0 = jax.tree.leaves(trainer.state.params)[0]
        p1 = jax.tree.leaves(trainer2.state.params)[0]
        np.testing.assert_allclose(np.asarray(p0), np.asarray(p1))

    def test_hmr_regressor_epoch_and_resume(self, tmp_path):
        """`whmr-train --regressor hmr` (reference train_options.py:19-20):
        the plain HMR baseline trains and round-trips through the same
        checkpoint machinery."""
        cfg = tiny_config()
        trainer = Trainer(cfg, str(tmp_path / "hmr"), regressor="hmr")
        assert trainer.render_consts is None  # no dense heads to supervise
        last = trainer.train_epoch(batch_iter(cfg), log_every=1)
        assert np.isfinite(last["loss"])
        assert "loss_regr_pose_0" in last and "loss_keypoints_world_1" not in last
        assert int(trainer.state.step) == 2
        trainer.save(metric=last["loss"])
        trainer2 = Trainer(cfg, str(tmp_path / "hmr"), regressor="hmr")
        assert trainer2.resume()
        assert int(trainer2.state.step) == 2

    def test_profile_trace_window(self, tmp_path):
        """--profile writes a jax.profiler trace dir covering the chosen
        step window (utils/profiling wired via enable_profiling)."""
        cfg = tiny_config()
        trainer = Trainer(cfg, str(tmp_path / "prof"), aux_rendering=False)
        tdir = str(tmp_path / "trace")
        trainer.enable_profiling(tdir, steps=1, skip=1)
        trainer.train_epoch(batch_iter(cfg, n_batches=3), log_every=0)
        assert trainer._profile["done"]
        # jax writes plugins/profile/<ts>/*.xplane.pb under the log dir
        found = []
        for root, _dirs, files in os.walk(tdir):
            found += [f for f in files if f.endswith((".xplane.pb", ".trace.json.gz"))]
        assert found, f"no trace artifacts under {tdir}"

    def test_profile_with_grad_accum(self, tmp_path):
        """Regression: the profiler window's step counter must not shadow
        the accum count read lazily by the microbatch-split generator
        (a local named `k` broke --profile + --grad_accum together)."""
        from dataclasses import replace

        cfg = tiny_config()
        # micro = batch/accum must divide the 8-device test mesh data axis
        cfg = replace(cfg, train=replace(cfg.train, grad_accum=2, batch_size=16))
        trainer = Trainer(cfg, str(tmp_path / "profacc"), aux_rendering=False)
        trainer.enable_profiling(str(tmp_path / "trace"), steps=1, skip=1)
        last = trainer.train_epoch(
            batch_iter(cfg, n_batches=3, batch=16), log_every=0
        )
        assert trainer._profile["done"]
        assert last == {}  # log_every=0: no metrics materialized
        assert int(trainer.state.step) == 3

    def test_epoch_boundary_resume_does_not_retrain(self, tmp_path):
        """An epoch-boundary checkpoint records epoch+1 (reference
        trainer.py:362,662), so resume continues at the NEXT epoch instead
        of silently retraining the finished one."""
        cfg = tiny_config()
        trainer = Trainer(cfg, str(tmp_path / "runE"), aux_rendering=False)
        trainer.fit(lambda epoch: batch_iter(cfg, n_batches=2), num_epochs=1,
                    log_every=1)
        assert int(trainer.state.step) == 2

        trainer2 = Trainer(cfg, str(tmp_path / "runE"), aux_rendering=False)
        assert trainer2.resume()
        assert trainer2.epoch == 1 and trainer2.batch_idx == 0
        # Continuing to num_epochs=2 runs exactly ONE more epoch (epoch 1).
        trainer2.fit(lambda epoch: batch_iter(cfg, n_batches=2), num_epochs=2,
                     log_every=1)
        assert int(trainer2.state.step) == 4

    def test_fit_with_validation_best_ckpt(self, tmp_path):
        cfg = tiny_config()
        trainer = Trainer(cfg, str(tmp_path / "run2"), aux_rendering=False)
        vals = iter([5.0, 3.0, 4.0])

        def fake_validate(state):
            return {"pa_mpjpe": next(vals)}

        trainer.fit(
            lambda epoch: batch_iter(cfg, n_batches=1),
            num_epochs=3,
            validate_fn=fake_validate,
            log_every=1,
        )
        assert trainer.ckpt._best_metric == 3.0
        best = trainer.ckpt.restore_best()
        assert best is not None

    def test_mid_epoch_resume(self, tmp_path):
        """Kill/resume continues within an epoch: batch_idx rides the
        checkpoint payload (reference base_trainer.py:45-48)."""
        cfg = tiny_config()
        trainer = Trainer(cfg, str(tmp_path / "runM"), aux_rendering=False)
        # train 3 batches with mid-epoch saves every 2
        trainer.train_epoch(batch_iter(cfg, n_batches=3), log_every=1, save_every=2)
        assert trainer.batch_idx == 3
        trainer.save(batch_idx=trainer.batch_idx)

        trainer2 = Trainer(cfg, str(tmp_path / "runM"), aux_rendering=False)
        assert trainer2.resume()
        assert trainer2.batch_idx == 3
        assert int(trainer2.state.step) == 3
        # fit skips the first 3 batches of the resumed epoch: with a 4-batch
        # epoch only 1 step runs, then the next epoch runs all 4.
        trainer2.fit(
            lambda epoch: batch_iter(cfg, n_batches=4),
            num_epochs=trainer2.epoch + 2,
            log_every=1,
        )
        assert int(trainer2.state.step) == 3 + 1 + 4

    def test_log_every_spans_epochs(self, tmp_path):
        """log_every larger than the epoch length must still log: the
        cadence counts optimizer steps across epochs, not the per-epoch
        batch index (a 4-step overfit epoch with --log_every 8 logged
        NOTHING for 4000 steps before this fix)."""
        cfg = tiny_config()
        trainer = Trainer(cfg, str(tmp_path / "runL"), aux_rendering=False)
        # 2-batch epochs, log_every=3: logs at cumulative steps 3 and 6.
        trainer.fit(lambda epoch: batch_iter(cfg, n_batches=2), num_epochs=3,
                    log_every=3)
        with open(trainer.metrics.path) as f:
            steps = [__import__("json").loads(l)["step"] for l in f]
        assert steps == [3, 6]

    def test_lr_decay_at_epoch_boundary(self):
        """LR decays by gamma when the step count crosses a decay epoch
        (reference trainer.py:330-338); epochs are converted to steps."""
        from dataclasses import replace

        from whmr_tpu.training.train_step import make_optimizer

        cfg = tiny_config()
        cfg = replace(cfg, train=replace(cfg.train, lr_decay_epochs=(2,)))
        tx = make_optimizer(cfg, steps_per_epoch=5)
        import jax.numpy as jnp
        import optax

        params = {"w": jnp.ones(3)}
        state = tx.init(params)
        grads = {"w": jnp.ones(3)}
        lrs = []
        for _ in range(12):
            updates, state = tx.update(grads, state, params)
            # Adam of a constant grad: |update| == current LR
            lrs.append(float(jnp.abs(updates["w"][0])))
        # steps 0-9 at base_lr, step >= 10 (= epoch 2) decayed by 0.1
        np.testing.assert_allclose(lrs[0], cfg.train.base_lr, rtol=1e-4)
        np.testing.assert_allclose(lrs[9], cfg.train.base_lr, rtol=1e-4)
        np.testing.assert_allclose(lrs[10], cfg.train.base_lr * 0.1, rtol=1e-4)
        np.testing.assert_allclose(lrs[11], cfg.train.base_lr * 0.1, rtol=1e-4)

    def test_validate_fn_glue(self, tmp_path):
        """Trainer.make_validate_fn runs the eval pipeline over a loader."""
        from whmr_tpu.utils.testing import make_example_train_batch

        cfg = tiny_config()
        trainer = Trainer(cfg, str(tmp_path / "run3"), aux_rendering=False)

        def val_loader():
            yield make_example_train_batch(cfg, 4, seed=99)

        validate = trainer.make_validate_fn(val_loader)
        result = validate(trainer.state)
        assert result["count"] == 4
        assert np.isfinite(result["pa_mpjpe"])

    def test_validate_consumes_global_pose(self, tmp_path):
        """World-frame protocol: validation GT joints come from
        'global_pose', not the crop-local 'pose' (the mismatch whmr-eval
        hard-aborts on; a validate-side key filter once dropped it and
        silently scored world predictions against camera-frame GT). Two
        batches identical except for global_pose must score different
        MPJPE — under the dropped-key bug both fall back to 'pose' and
        score identically."""
        import scipy.spatial.transform as sst

        from whmr_tpu.utils.testing import make_example_train_batch

        cfg = tiny_config()
        trainer = Trainer(cfg, str(tmp_path / "runv"), aux_rendering=False)
        base = make_example_train_batch(cfg, 4, seed=7)
        rot = np.broadcast_to(
            sst.Rotation.from_euler("x", 25, degrees=True).as_matrix(),
            (4, 3, 3),
        ).astype(np.float32)
        gp = np.array(base["pose"], np.float32).copy()
        gp[:, 0] += 0.6  # world orient differs from the crop-local pose

        def with_gp(g):
            b = dict(base)
            b["cam_rotmat"] = rot
            b["global_pose"] = g
            return lambda: [b]

        r_world = trainer.make_validate_fn(with_gp(gp))(trainer.state)
        r_local = trainer.make_validate_fn(
            with_gp(np.array(base["pose"], np.float32))
        )(trainer.state)
        assert np.isfinite(r_world["mpjpe"]) and np.isfinite(r_local["mpjpe"])
        assert abs(r_world["mpjpe"] - r_local["mpjpe"]) > 1e-3, (
            "global_pose did not reach the eval step — validation is "
            "scoring against the camera-frame 'pose' fallback"
        )
