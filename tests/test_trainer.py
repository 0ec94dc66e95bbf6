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
