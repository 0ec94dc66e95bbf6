"""Checkpoint save/resume with latest / by-step / best policies.

Orbax-backed equivalent of reference `utils/saver.py` CheckpointSaver
(:8-117): overwrite-latest, save-every-N-steps, per-epoch, best-metric copy,
resume-latest by step number. State payload mirrors the reference's
{model, optimizer, epoch, batch_idx, total_step_count} (saver.py:26-64) as
{params, batch_stats, opt_state, step, epoch, batch_idx}.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import numpy as np
import orbax.checkpoint as ocp


def _tree_mismatch(template, got, path: str = "") -> Optional[str]:
    """First structural difference between two weight trees (nested dicts
    of arrays), as a human-readable path, or None if they match in keys
    and leaf shapes. dtype is deliberately not compared (checkpoints may
    legitimately hold a different storage dtype than the live model)."""
    t_is_map, g_is_map = hasattr(template, "items"), hasattr(got, "items")
    if t_is_map != g_is_map:
        return (f"{path or '/'}: {type(template).__name__} in model vs "
                f"{type(got).__name__} in checkpoint")
    if t_is_map:
        tk, gk = set(template.keys()), set(got.keys())
        if tk != gk:
            return (f"{path or '/'}: missing {sorted(tk - gk)}, "
                    f"unexpected {sorted(gk - tk)}")
        for k in sorted(tk):
            bad = _tree_mismatch(template[k], got[k], f"{path}/{k}")
            if bad is not None:
                return bad
        return None
    ts, gs = np.shape(template), np.shape(got)
    if ts != gs:
        return f"{path}: checkpoint shape {gs} vs model {ts}"
    return None


class CheckpointManager:
    def __init__(self, save_dir: str, max_to_keep: int = 5):
        self.save_dir = os.path.abspath(save_dir)
        os.makedirs(self.save_dir, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.save_dir,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )
        self._best_metric: Optional[float] = None
        self._best_dir = os.path.join(self.save_dir, "best")
        self._best_ckptr = ocp.StandardCheckpointer()

    def save(self, step: int, payload: Dict[str, Any], metric: Optional[float] = None, lower_is_better: bool = True, block: bool = True):
        """Save a step checkpoint; track/copy best by `metric`.

        block=False returns once orbax has snapshotted the (host) arrays and
        the disk write continues on its background thread — net-new vs the
        reference's synchronous torch.save (saver.py:26-64); mid-epoch
        periodic saves then cost the device_get only, not the disk IO. Any
        in-flight save is always drained first, so saves never interleave.

        Saving a step that is already the latest on disk is a NO-OP for the
        step artifact (orbax raises StepAlreadyExistsError on a second save
        at the same step): it happens legitimately when an epoch-boundary
        save lands on the same step as a --save_every periodic save, or
        when a resumed run's first boundary save lands on the restored
        step. The best-metric copy below still runs, so boundary metrics
        keep feeding best-checkpoint tracking."""
        self.wait_until_finished()
        if self._mgr.latest_step() != step:
            self._mgr.save(step, args=ocp.args.StandardSave(payload))
        if metric is not None:
            better = (
                self._best_metric is None
                or (metric < self._best_metric if lower_is_better else metric > self._best_metric)
            )
            if better:
                self._best_metric = float(metric)
                if os.path.exists(self._best_dir):
                    import shutil

                    shutil.rmtree(self._best_dir)
                self._best_ckptr.save(self._best_dir, payload)
        if block:
            self.wait_until_finished()

    def wait_until_finished(self) -> None:
        """Drain in-flight async writes (step manager + best copy)."""
        self._mgr.wait_until_finished()
        self._best_ckptr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        self._mgr.wait_until_finished()
        return self._mgr.latest_step()

    def restore(self, step: Optional[int] = None, template: Optional[Dict[str, Any]] = None) -> Optional[Dict[str, Any]]:
        """Restore by step (default latest). With a template pytree the
        arrays come back with matching structure/dtypes."""
        self.wait_until_finished()
        step = step if step is not None else self.latest_step()
        if step is None:
            return None
        if template is not None:
            return self._mgr.restore(
                step, args=ocp.args.StandardRestore(template)
            )
        return self._mgr.restore(step)

    def restore_weights(self, template: Dict[str, Any]) -> Optional[Dict[str, Any]]:
        """Restore just model weights {params, batch_stats}, accepting
        either checkpoint flavor: a full training payload (params,
        batch_stats, opt_state, step, epoch, batch_idx — whmr-train's
        main dir) or a weights-only payload (params, batch_stats — the
        EMA dir `checkpoints_ema`, and converted-torch checkpoints).
        The caller's template may itself be either shape (e.g. whmr-eval's
        HMR branch has no optimizer). orbax StandardRestore requires the
        template to match the saved structure exactly, so both shapes are
        tried; when neither matches (a full checkpoint but a weights-only
        template whose opt_state structure is unknown — the whmr-eval
        --regressor hmr on a whmr-train checkpoint case), fall back to a
        structure-free raw read and keep only the weight subtrees (safe:
        params/batch_stats are plain dict trees, preserved verbatim)."""
        if self.latest_step() is None:
            return None
        weights_only = {
            "params": template["params"],
            "batch_stats": template["batch_stats"],
        }
        candidates = (
            [template, weights_only] if "opt_state" in template else [weights_only]
        )
        payload = None
        for cand in candidates:
            try:
                payload = self.restore(template=cand)
                break
            except Exception:
                payload = None
        if payload is None:
            # Raw read, no structure enforcement — so validate the weight
            # subtrees against the template before returning: a wrong-model
            # checkpoint must fail HERE with a clear diagnosis, not later
            # inside model.apply with an opaque flax scope error.
            payload = self.restore()
            if payload is None:
                return None
            for part in ("params", "batch_stats"):
                bad = _tree_mismatch(weights_only[part], payload.get(part, {}), part)
                if bad is not None:
                    raise ValueError(
                        f"checkpoint in {self.save_dir} does not match the "
                        f"requested model: {bad}"
                    )
        return {"params": payload["params"],
                "batch_stats": payload["batch_stats"]}

    def restore_best(self, template: Optional[Dict[str, Any]] = None):
        self._best_ckptr.wait_until_finished()
        if not os.path.exists(self._best_dir):
            return None
        ck = ocp.StandardCheckpointer()
        if template is not None:
            return ck.restore(self._best_dir, target=template)
        return ck.restore(self._best_dir)
