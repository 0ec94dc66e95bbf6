"""Benchmark evaluation: MPJPE / PA-MPJPE / PVE over npz-label datasets.

Functional equivalent of reference `evaluate/eval.py:65-361`
(`run_evaluation`) and the in-loop validation (core/trainer.py:753-907),
restructured for TPU:

- The whole metric pipeline (GT SMPL forward, H36M joint regression, pelvis
  centering, Procrustes alignment) runs inside one jitted eval-step; the
  per-sample numpy SVD loop of the reference (pose_utils.py:60-65) becomes a
  batched device SVD.
- Metrics accumulate on device; one scalar transfer per batch.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Iterable

import jax
import jax.numpy as jnp

from whmr_tpu.config import WHMRConfig
from whmr_tpu.models.regressor import BodyConsts
from whmr_tpu.models.smpl import smpl_forward
from whmr_tpu.models.whmr import WHMR
from whmr_tpu.ops.procrustes import batch_compute_similarity_transform
from whmr_tpu.ops.rotation import batch_rodrigues


@dataclasses.dataclass
class EvalMetrics:
    mpjpe_sum: float = 0.0
    pa_mpjpe_sum: float = 0.0
    pve_sum: float = 0.0
    count: int = 0

    def update(self, mpjpe_b, pa_b, pve_b, n):
        self.mpjpe_sum += float(mpjpe_b)
        self.pa_mpjpe_sum += float(pa_b)
        self.pve_sum += float(pve_b)
        self.count += int(n)

    def result(self) -> Dict[str, float]:
        c = max(self.count, 1)
        return {
            # reported in mm, matching eval.py:322-331 prints (x1000)
            "mpjpe": self.mpjpe_sum / c * 1000.0,
            "pa_mpjpe": self.pa_mpjpe_sum / c * 1000.0,
            "pve": self.pve_sum / c * 1000.0,
            "count": self.count,
        }


def make_eval_step(
    cfg: WHMRConfig,
    model,
    gendered_smpl=None,
    joint_mapper: str = "j14",
    save_arrays: bool = False,
    regressor: str = "pymaf_net",
    mesh=None,
    forward_override=None,
):
    """Jitted eval step: batch -> ((sum_mpjpe, sum_pa, sum_pve, n), extras).

    With `mesh`, the batch is sharded over the 'data' axis and the metric
    sums become global reductions (multi-chip data-parallel evaluation —
    net-new vs the reference, which validates on rank 0 only,
    train.py:44-47).

    Mirrors eval.py:155-228: model fwd with GT cam_rotmat; world-frame
    (global) vertices; H36M-regressed joints, pelvis-centered, sliced by
    `joint_mapper` ('j14' default, 'j17' for the mpi-inf-3dhp protocol,
    eval.py:150-151).

    GT vertices come from (in priority order): precomputed batch
    'gt_vertices'; gendered SMPL models selected per-sample by batch
    'gender' (0=male, 1=female, else neutral — the 3DPW protocol,
    trainer.py:784-798) when `gendered_smpl={'male': SMPLParams,
    'female': SMPLParams}` is given; else the neutral model.

    save_arrays=True additionally returns per-sample arrays for the
    `--result_file` dump (eval.py:312-319): full 17 H36M pred joints,
    mapped/centered pred & gt & Procrustes-aligned pred, pose/betas/cam.
    """
    from whmr_tpu.data.assets import H36M_TO_J14, H36M_TO_J17
    from whmr_tpu.models.smpl import select_h36m_joints

    mapper = H36M_TO_J17 if joint_mapper == "j17" else H36M_TO_J14

    def step(variables, consts: BodyConsts, batch):
        if forward_override is not None:
            # pluggable prediction path (e.g. an exported eval-variant
            # bundle's StableHLO graph, whmr-eval --bundle): returns the
            # same (world verts, final-stage params) contract as the live
            # pymaf forward below. `variables` carries whatever the
            # override needs (bundle weights) as a jit ARGUMENT.
            pred_verts, last_params = forward_override(
                variables, consts, batch
            )
        elif regressor == "hmr":
            # HMR baseline (reference eval.py:174-176): camera-frame mesh
            # straight from (rotmat, betas).
            rotmat, betas, _cam = model.apply(
                variables, consts, batch["img"], train=False
            )
            pred_verts = smpl_forward(consts.smpl, betas, rotmat).vertices
            from whmr_tpu.ops.rotation import rotmat_to_angle_axis

            # Real axis-angle pose for the --result_file dump (the reference
            # dump stores smpl_pose, eval.py:312-319 — not zeros).
            pose_aa = rotmat_to_angle_axis(rotmat.reshape(-1, 3, 3)).reshape(-1, 72)
            last_params = {
                "pose": pose_aa,
                "pred_shape": betas,
                "pred_cam": _cam,
            }
        else:
            preds = model.apply(
                variables,
                consts,
                batch["img"],
                batch["center"],
                batch["scale"],
                batch["bbox_height"],
                batch["orig_shape"],
                batch["bbox_info"],
                train=False,
                cam_rotmat=batch.get("cam_rotmat"),
            )
            pred_verts = preds["global_output"]["global_verts"]
            last_params = preds["smpl_out"][-1]
        pred_j = select_h36m_joints(consts.j_regressor_h36m, pred_verts, mapper)

        # GT: either direct vertices (3dpw gendered) or pose/betas. The
        # world-frame protocol prefers global_pose when the labels carry it
        # (eval.py:157-163: predictions are world-frame global verts).
        if "gt_vertices" in batch:
            gt_verts = batch["gt_vertices"]
        else:
            gt_pose = batch.get("global_pose", batch["pose"])
            gt_rotmats = batch_rodrigues(gt_pose.reshape(-1, 3)).reshape(-1, 24, 3, 3)
            gt_verts = smpl_forward(consts.smpl, batch["betas"], gt_rotmats).vertices
            if gendered_smpl is not None and "gender" in batch:
                male = smpl_forward(gendered_smpl["male"], batch["betas"], gt_rotmats).vertices
                female = smpl_forward(gendered_smpl["female"], batch["betas"], gt_rotmats).vertices
                g = batch["gender"][:, None, None]
                gt_verts = jnp.where(g == 0, male, jnp.where(g == 1, female, gt_verts))
        gt_j = select_h36m_joints(consts.j_regressor_h36m, gt_verts, mapper)

        valid = batch["valid"].astype(jnp.float32)
        err = jnp.sqrt(jnp.sum((pred_j - gt_j) ** 2, axis=-1)).mean(axis=-1)
        aligned = batch_compute_similarity_transform(pred_j, gt_j)
        err_pa = jnp.sqrt(jnp.sum((aligned - gt_j) ** 2, axis=-1)).mean(axis=-1)
        # PVE is RAW per-vertex error — the reference protocol does not
        # pelvis-align vertices (eval.py:207-209, trainer.py:882; only the
        # JOINT metrics center on the pelvis).
        pve = jnp.sqrt(jnp.sum((pred_verts - gt_verts) ** 2, axis=-1)).mean(axis=-1)
        sums = (
            jnp.sum(err * valid),
            jnp.sum(err_pa * valid),
            jnp.sum(pve * valid),
            jnp.sum(valid),
        )
        extras = None
        if save_arrays:
            from whmr_tpu.models.smpl import vertices2joints

            extras = {
                "pred_joints": vertices2joints(consts.j_regressor_h36m, pred_verts),
                "pred": pred_j,
                "pred_pa": aligned,
                "gt": gt_j,
                "pose": last_params["pose"],
                "betas": last_params["pred_shape"],
                "camera": last_params["pred_cam"],
                "valid": valid,
            }
        return sums, extras

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        rep = NamedSharding(mesh, P())
        return jax.jit(
            step,
            in_shardings=(rep, rep, NamedSharding(mesh, P("data"))),
        )
    return jax.jit(step)


def run_evaluation(
    cfg: WHMRConfig,
    model: WHMR,
    variables,
    consts: BodyConsts,
    batches: Iterable[Dict[str, jnp.ndarray]],
    log_every: int = 10,
    gendered_smpl=None,
    joint_mapper: str = "j14",
    result_file: str = None,
    regressor: str = "pymaf_net",
    mesh=None,
    forward_override=None,
    fixed_batch: int = None,
) -> Dict[str, float]:
    """Drive the eval loop over an iterable of device-ready batches.

    result_file: path to dump per-sample prediction arrays as npz
    (reference eval.py:312-319 npz + mat dump).
    regressor: 'pymaf_net' (WHMR) or 'hmr' baseline (eval.py:52,174-176).
    mesh: data-parallel eval over the mesh's 'data' axis. Batches are
    zero-padded (valid=0) to the first batch's size so every step keeps
    one fixed sharded shape; padded rows contribute nothing to the sums
    and are trimmed from --result_file arrays.
    fixed_batch: pad every batch to exactly this size (a fixed-batch
    exported bundle's traced shape); same valid=0 masking and dump trim.
    """
    step = make_eval_step(
        cfg, model, gendered_smpl=gendered_smpl, joint_mapper=joint_mapper,
        save_arrays=result_file is not None, regressor=regressor, mesh=mesh,
        forward_override=forward_override,
    )
    pad_to = None
    if mesh is not None:
        from whmr_tpu.parallel import batch_sharding, replicated

        data_sharding = batch_sharding(mesh)
        # checkpoint-restored arrays arrive committed to device 0; replicate
        # them across the mesh or jit rejects the mixed device assignment
        rep = replicated(mesh)
        variables = jax.device_put(variables, rep)
        consts = jax.device_put(consts, rep)

    def place(batch):
        nonlocal pad_to
        n = batch[next(iter(batch))].shape[0]
        if mesh is None and fixed_batch is None:
            return batch, n
        if pad_to is None:
            if fixed_batch is not None:
                pad_to = fixed_batch
            else:
                ndata = mesh.shape["data"]
                pad_to = max(n, ndata) if n % ndata == 0 else n + (-n) % ndata
        if n > pad_to:
            raise ValueError(
                f"batch of {n} exceeds the fixed eval shape {pad_to} set by "
                "the first batch; feed equal-size batches (last may be "
                "smaller)"
            )
        pad = pad_to - n
        if pad:
            batch = {
                k: jnp.concatenate(
                    [v, jnp.zeros((pad, *v.shape[1:]), v.dtype)]
                )
                for k, v in batch.items()
            }
            # THE masking mechanism: padded rows carry valid=0 so they
            # contribute nothing to any metric sum. (Zero-fill above already
            # implies it, but masking must not silently depend on the
            # padding fill value.)
            batch["valid"] = batch["valid"].at[n:].set(0)
        if mesh is None:
            return batch, n
        return (
            {k: jax.device_put(v, data_sharding) for k, v in batch.items()},
            n,
        )
    metrics = EvalMetrics()
    collected: Dict[str, list] = {}
    # Per-batch sums stay on device until a log boundary (or the end):
    # float() per batch would block on every batch's compute + transfer,
    # serializing host-side batch prep with the device. Dispatch is async,
    # so deferring the readback keeps both sides busy.
    pending: list = []

    def flush():
        for s_mpjpe, s_pa, s_pve, n in jax.device_get(pending):
            metrics.update(s_mpjpe, s_pa, s_pve, n)
        pending.clear()

    for i, batch in enumerate(batches):
        batch, n = place(batch)
        sums, extras = step(variables, consts, batch)
        pending.append(sums)
        if extras is not None:
            # device_get here is unavoidable (arrays are dumped to npz) but
            # fetches batch i while batch i+1's step is already dispatched.
            host = jax.device_get(extras)
            for k, v in host.items():
                # padded rows (mesh mode) are trimmed from the dump
                collected.setdefault(k, []).append(v[:n])
        if log_every and (i + 1) % log_every == 0:
            flush()
            r = metrics.result()
            print(
                f"[eval] {metrics.count} samples  MPJPE {r['mpjpe']:.2f}  "
                f"PA-MPJPE {r['pa_mpjpe']:.2f}  PVE {r['pve']:.2f}"
            )
    flush()
    if result_file and collected:
        import numpy as np

        np.savez(
            result_file, **{k: np.concatenate(v) for k, v in collected.items()}
        )
        print(f"[eval] per-sample results saved to {result_file}")
    return metrics.result()
