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
