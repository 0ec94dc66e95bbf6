"""CheckpointManager unit tests (utils/checkpoint.py).

Reference counterpart: utils/saver.py CheckpointSaver (synchronous
torch.save). The async-write path (save(block=False)) is net-new; these
tests gate that restore/latest_step always drain in-flight writes, so
async saving can never be observed as a missing or partial checkpoint.
"""

import numpy as np

from whmr_tpu.utils.checkpoint import CheckpointManager


def payload(seed, step):
    rng = np.random.RandomState(seed)
    return {
        "params": {"w": rng.randn(64, 64).astype(np.float32)},
        "batch_stats": {"m": rng.randn(8).astype(np.float32)},
        "opt_state": {"mu": rng.randn(64, 64).astype(np.float32)},
        "step": np.asarray(step, np.int32),
        "epoch": 0,
        "batch_idx": 0,
    }


class TestCheckpointManager:
    def test_async_save_then_restore_round_trips(self, tmp_path):
        mgr = CheckpointManager(str(tmp_path / "ck"))
        p1 = payload(1, 10)
        mgr.save(10, p1, block=False)
        # restore with NO explicit wait: must drain the in-flight write
        got = mgr.restore(template=payload(0, 0))
        assert got["step"] == 10
        np.testing.assert_array_equal(got["params"]["w"], p1["params"]["w"])

    def test_back_to_back_async_saves_serialize(self, tmp_path):
        mgr = CheckpointManager(str(tmp_path / "ck"))
        for s in (5, 6, 7):
            mgr.save(s, payload(s, s), block=False)
        assert mgr.latest_step() == 7
        got = mgr.restore(template=payload(0, 0))
        np.testing.assert_array_equal(
            got["params"]["w"], payload(7, 7)["params"]["w"]
        )

    def test_same_step_resave_is_noop_but_tracks_metric(self, tmp_path):
        """An epoch-boundary save landing on the same step as a periodic
        --save_every save (or a resumed run's first boundary save at the
        restored step) must not crash with orbax StepAlreadyExistsError;
        the best-metric copy still updates."""
        mgr = CheckpointManager(str(tmp_path / "ck"))
        mgr.save(10, payload(1, 10), block=True)          # periodic save
        mgr.save(10, payload(1, 10), metric=5.0, block=True)  # boundary save
        assert mgr.latest_step() == 10
        # metric fed best tracking even though the step write was skipped
        best = mgr.restore_best(template=payload(0, 0))
        assert best is not None and best["step"] == 10
        # a later better metric still replaces the best copy
        mgr.save(20, payload(2, 20), metric=1.0, block=True)
        best = mgr.restore_best(template=payload(0, 0))
        assert best["step"] == 20

    def test_restore_weights_accepts_any_template_x_payload_shape(self, tmp_path):
        """restore_weights must load the weight subtrees for every
        combination of checkpoint flavor (full train payload vs
        weights-only) and caller template shape (with vs without
        opt_state). The (full payload, weights-only template) cell is the
        `whmr-eval --regressor hmr` on a whmr-train checkpoint case —
        regressed before round 5 because the strict StandardRestore has
        no matching template there (the eval CLI has no optimizer to
        build an opt_state template from)."""
        full = payload(1, 10)
        weights_only_payload = {
            "params": full["params"], "batch_stats": full["batch_stats"]
        }
        for i, saved in enumerate((full, weights_only_payload)):
            for j, templ in enumerate((payload(0, 0), {
                "params": {"w": np.zeros((64, 64), np.float32)},
                "batch_stats": {"m": np.zeros(8, np.float32)},
            })):
                mgr = CheckpointManager(str(tmp_path / f"ck{i}{j}"))
                mgr.save(10, saved)
                got = mgr.restore_weights(templ)
                assert set(got) == {"params", "batch_stats"}
                np.testing.assert_array_equal(
                    got["params"]["w"], full["params"]["w"]
                )

    def test_restore_weights_empty_dir_returns_none(self, tmp_path):
        mgr = CheckpointManager(str(tmp_path / "ck"))
        assert mgr.restore_weights(payload(0, 0)) is None

    def test_restore_weights_wrong_model_fails_loudly(self, tmp_path):
        """The raw-read fallback must not silently hand a different
        model's weights to the caller: key and leaf-shape mismatches vs
        the template raise a clear ValueError naming the first diff."""
        import pytest

        mgr = CheckpointManager(str(tmp_path / "ck"))
        mgr.save(10, payload(1, 10))
        wrong_keys = {
            "params": {"other": np.zeros((3,), np.float32)},
            "batch_stats": {"m": np.zeros(8, np.float32)},
        }
        with pytest.raises(ValueError, match="does not match.*missing"):
            mgr.restore_weights(wrong_keys)
        wrong_shape = {
            "params": {"w": np.zeros((2, 2), np.float32)},
            "batch_stats": {"m": np.zeros(8, np.float32)},
        }
        with pytest.raises(ValueError, match="shape"):
            mgr.restore_weights(wrong_shape)

    def test_best_copy_tracks_metric_async(self, tmp_path):
        mgr = CheckpointManager(str(tmp_path / "ck"))
        mgr.save(1, payload(1, 1), metric=5.0, block=False)
        mgr.save(2, payload(2, 2), metric=3.0, block=False)  # better
        mgr.save(3, payload(3, 3), metric=9.0, block=False)  # worse
        best = mgr.restore_best(template=payload(0, 0))
        assert best["step"] == 2
        np.testing.assert_array_equal(
            best["params"]["w"], payload(2, 2)["params"]["w"]
        )


class TestEMACheckpoints:
    def test_trainer_writes_ema_dir_and_clis_can_load_it(self, tmp_path):
        """train.ema_decay>0 -> <run>/checkpoints_ema written with a
        weights-only payload; restore_weights and the demo/eval loaders
        accept BOTH checkpoint flavors."""
        from dataclasses import replace

        import jax
        import numpy as np

        from whmr_tpu.training.trainer import Trainer
        from whmr_tpu.utils.checkpoint import CheckpointManager
        from whmr_tpu.utils.testing import make_example_train_batch, tiny_config

        cfg = tiny_config()
        cfg = replace(
            cfg,
            train=replace(cfg.train, batch_size=8, ema_decay=0.9),
            pymaf=replace(cfg.pymaf, aux_supv_on=False),
        )
        run = tmp_path / "run"
        tr = Trainer(cfg, log_dir=str(run), aux_rendering=False)
        batch = make_example_train_batch(cfg, 8)

        def loader():
            for _ in range(2):
                yield {k: np.asarray(v) for k, v in batch.items()}

        tr.train_epoch(loader(), log_every=0, max_steps=2)
        tr.save()
        assert (run / "checkpoints_ema").is_dir()

        # weights-only flavor loads through restore_weights
        full_template = {
            "params": tr.state.params, "batch_stats": tr.state.batch_stats,
            "opt_state": tr.state.opt_state,
            "step": np.zeros((), np.int32), "epoch": 0, "batch_idx": 0,
        }
        got = CheckpointManager(str(run / "checkpoints_ema")).restore_weights(
            full_template
        )
        assert got is not None
        for a, b in zip(jax.tree.leaves(got["params"]),
                        jax.tree.leaves(tr.state.ema_params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-7)
        # ema differs from the live params after 2 steps
        diffs = [float(np.abs(np.asarray(a) - np.asarray(b)).max())
                 for a, b in zip(jax.tree.leaves(got["params"]),
                                 jax.tree.leaves(tr.state.params))]
        assert max(diffs) > 0
        # the full-training dir ALSO loads through the same helper
        got_main = CheckpointManager(str(run / "checkpoints")).restore_weights(
            full_template
        )
        assert got_main is not None

        # resume restores the EMA average
        tr2 = Trainer(cfg, log_dir=str(run), aux_rendering=False)
        assert tr2.resume()
        for a, b in zip(jax.tree.leaves(tr2.state.ema_params),
                        jax.tree.leaves(tr.state.ema_params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-7)

        # the demo pipeline builder accepts the ema dir directly
        from argparse import Namespace

        from whmr_tpu.inference.demo_cli import build_pipeline

        misc = ["vit.embed_dim", "64", "vit.depth", "2",
                "vit.num_heads", "2", "deconv.num_filters", "32,32,32",
                "pymaf.mlp_dim", "32,16,8,4", "pymaf.aux_supv_on", "false"]
        pipe = build_pipeline(Namespace(
            misc=misc, cfg_file=None, data_dir=None,
            checkpoint=str(run / "checkpoints_ema"), bundle=None,
            max_people=2, no_camcalib=True, data_parallel=0,
            tensor_parallel=0, dtype="fp32",
        ))
        for a, b in zip(jax.tree.leaves(pipe.variables["params"]),
                        jax.tree.leaves(tr.state.ema_params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-7)
