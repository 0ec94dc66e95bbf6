"""Sharded training step: one jitted program = fwd + loss + grad + update.

The TPU counterpart of reference `Trainer.train_step` (core/trainer.py:
380-636). Differences by design:
- GT SMPL forward, mesh downsampling and the camera-translation LSQ all run
  inside the same XLA program as the model (the reference bounces to numpy
  per sample for the LSQ, trainer.py:433-436).
- Gradient all-reduce over the 'data' mesh axis is inserted by GSPMD; no DDP
  wrapper, no explicit collectives.
- BatchNorm running stats update inside the step (mutable collection);
  reductions over the sharded batch are global, i.e. sync-BN semantics.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import FrozenDict

from whmr_tpu.config import WHMRConfig
from whmr_tpu.models.regressor import BodyConsts
from whmr_tpu.models.smpl import smpl_forward
from whmr_tpu.models.whmr import WHMR
from whmr_tpu.training.losses import whmr_loss


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    # EMA of params (train.ema_decay > 0), else None. Updated in-graph by
    # apply_gradients; checkpointed separately (trainer.save).
    ema_params: Any = None
    ema_decay: float = struct.field(pytree_node=False, default=0.0)

    def apply_gradients(self, grads, new_batch_stats):
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        ema = self.ema_params
        if ema is not None:
            d = self.ema_decay
            ema = jax.tree_util.tree_map(
                lambda e, p: d * e + (1.0 - d) * p, ema, new_params
            )
        return self.replace(
            step=self.step + 1,
            params=new_params,
            batch_stats=new_batch_stats,
            opt_state=new_opt_state,
            ema_params=ema,
        )


def make_optimizer(
    cfg: WHMRConfig, steps_per_epoch: int = 1
) -> optax.GradientTransformation:
    """Adam at BASE_LR with step-decay at epoch boundaries.

    The reference decays the optimizer LR by `lr_gamma` when the epoch
    counter crosses each entry of the decay list (core/trainer.py:330-338).
    optax schedules are keyed by STEP count, so the epoch boundaries are
    converted with `steps_per_epoch` (pass the per-epoch batch count; the
    default 1 degenerates to treating the entries as step indices).
    """
    if cfg.train.lr_decay_epochs:
        sched = optax.piecewise_constant_schedule(
            cfg.train.base_lr,
            {
                int(e) * int(steps_per_epoch): cfg.train.lr_gamma
                for e in cfg.train.lr_decay_epochs
            },
        )
    else:
        sched = cfg.train.base_lr
    if cfg.train.fused_adam:
        from whmr_tpu.training.optim import fused_adam

        tx = fused_adam(sched)
    else:
        tx = optax.adam(sched)
    if cfg.train.grad_clip_norm > 0:
        # Clip BEFORE Adam so the moments see the clipped gradients (the
        # standard production ordering); logged grad_norm stays pre-clip.
        tx = optax.chain(optax.clip_by_global_norm(cfg.train.grad_clip_norm), tx)
    return tx


def create_train_state(
    cfg: WHMRConfig,
    model: WHMR,
    consts: BodyConsts,
    rng: jax.Array,
    example_args: Dict[str, jnp.ndarray],
    steps_per_epoch: int = 1,
) -> TrainState:
    # Always initialize the COMPLETE parameter tree: the CamCalib branch
    # only traces when full_x is given, so init must include it or demo-time
    # `full_x` inference finds no cam_model params.
    example_args = dict(example_args)
    if "full_x" not in example_args:
        b = example_args["x"].shape[0]
        # CamCalib is fully convolutional + global-pooled: its param shapes
        # are input-size independent, so init with a small dummy (compiling
        # the 600x600 branch at init costs minutes on remote-compile hosts).
        example_args["full_x"] = jnp.zeros((b, 64, 64, 3), example_args["x"].dtype)

    # One jitted init: on remote-tunnel platforms an eager init would
    # dispatch thousands of individual ops host-side.
    variables = jax.jit(
        lambda c, a: model.init(
            {"params": rng, "dropout": jax.random.fold_in(rng, 1)},
            c,
            train=False,
            **a,
        )
    )(consts, example_args)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", FrozenDict())
    tx = make_optimizer(cfg, steps_per_epoch=steps_per_epoch)
    ema_decay = float(cfg.train.ema_decay)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        tx=tx,
        ema_params=(jax.tree_util.tree_map(jnp.array, params)
                    if ema_decay > 0 else None),
        ema_decay=ema_decay,
    )


def device_normalize(img: jnp.ndarray, pixel_noise: jnp.ndarray) -> jnp.ndarray:
    """uint8 crop + per-channel noise -> normalized f32 on DEVICE.

    Bit-matches the host finalize_crop chain (augment.py: crop*pn, clip
    to [0,255], /255, ImageNet mean/std) so the loader can ship uint8:
    4x less host->device traffic — on the tunnel host this is the train
    feed bottleneck (1.5 MB vs 6 MB per B64 step), and the elementwise
    chain fuses into the first conv's input for free."""
    from whmr_tpu.config import IMG_NORM_MEAN, IMG_NORM_STD

    out = img.astype(jnp.float32) * pixel_noise[:, None, None, :]
    out = jnp.clip(out, 0.0, 255.0) / 255.0
    mean = jnp.asarray(IMG_NORM_MEAN, jnp.float32)
    std = jnp.asarray(IMG_NORM_STD, jnp.float32)
    return (out - mean) / std


def _model_input(batch: Dict[str, jnp.ndarray]) -> jnp.ndarray:
    """batch['img'] as normalized f32: passthrough for the host-normalized
    f32 schema, device_normalize for the uint8 feed (dtype is static at
    trace time, so both schemas share one code path with no runtime cost)."""
    img = batch["img"]
    if img.dtype == jnp.uint8:
        return device_normalize(img, batch["pixel_noise"])
    return img


def _microbatch_grads(
    cfg: WHMRConfig,
    model: WHMR,
    params,
    batch_stats,
    consts: BodyConsts,
    batch: Dict[str, jnp.ndarray],
    rng: jax.Array,
    render_consts=None,
):
    """Gradients + losses + updated BN stats for one (micro)batch — the
    shared body of train_step and the grad-accumulation scan."""

    # GT SMPL forward + multi-scale GT vertices (trainer.py:414-423).
    from whmr_tpu.ops.rotation import batch_rodrigues

    gt_rotmats = batch_rodrigues(batch["pose"].reshape(-1, 3)).reshape(-1, 24, 3, 3)
    gt_out = smpl_forward(consts.smpl, batch["betas"], gt_rotmats)
    gt_vertices = gt_out.vertices
    # HIGHEST precision: these are loss TARGETS — bf16 downsampling would
    # add mm-scale noise to the sub/temp vertex losses.
    hi = jax.lax.Precision.HIGHEST
    gt_sub = jnp.einsum("sv,bvk->bsk", consts.dmap0, gt_vertices, precision=hi)
    gt_temp = jnp.einsum("ts,bsk->btk", consts.dmap1, gt_sub, precision=hi)

    uvia_gt = batch.get("uvia_gt")
    depth_gt = batch.get("depth_gt")
    want_render = cfg.pymaf.aux_supv_on or cfg.pymaf.depth_supv_on
    if uvia_gt is None and render_consts is not None and want_render:
        # On-device GT IUV rendering (replaces the reference's separate
        # pytorch3d pass, trainer.py:428-464): fit the GT weak camera from
        # the 2D keypoints, rasterize the GT mesh, encode to one-hot maps.
        from whmr_tpu.config import FOCAL_LENGTH
        from whmr_tpu.ops.camera import estimate_translation
        from whmr_tpu.ops.iuv import iuv_img2map
        from whmr_tpu.training.gt_renderer import (
            gt_camera_from_cam_t,
            render_gt_maps,
        )

        w, h = cfg.img_res
        kp_orig = batch["keypoints"].at[..., :2].set(
            0.5 * h * (batch["keypoints"][..., :2] + 1.0)
        )
        opt_cam_t = estimate_translation(
            gt_out.joints, kp_orig, FOCAL_LENGTH, (float(w), float(h))
        )
        gt_camera = gt_camera_from_cam_t(jax.lax.stop_gradient(opt_cam_t))
        # gt_render_mesh="sub" renders the already-computed dmap0-pooled
        # vertices (coarse mesh, ~4x fewer faces — see build_render_consts).
        n_rv = render_consts.source_verts
        expect = (
            consts.dmap0.shape[0]
            if cfg.pymaf.gt_render_mesh == "sub"
            else gt_vertices.shape[1]
        )
        if n_rv != expect:
            raise ValueError(
                f"render_consts sources {n_rv} vertices but "
                f"cfg.pymaf.gt_render_mesh={cfg.pymaf.gt_render_mesh!r} "
                f"expects {expect}: build_render_consts(mesh=...) and the "
                "config disagree"
            )
        render_verts = gt_vertices if expect == gt_vertices.shape[1] else gt_sub
        maps = render_gt_maps(
            render_consts,
            render_verts,
            gt_camera,
            heatmap_size=cfg.pymaf.dp_heatmap_size,
            vitpose_slice=cfg.pymaf.backbone == "vitpose",
            with_depth=cfg.pymaf.depth_supv_on,
            valid=batch["has_smpl"],
        )
        if cfg.pymaf.aux_supv_on:
            uvia_gt = iuv_img2map(maps["iuv_image_gt"])
        if cfg.pymaf.depth_supv_on:
            depth_gt = maps["depth_image_gt"]

    def loss_fn(params):
        variables = {"params": params, "batch_stats": batch_stats}
        preds, mutated = model.apply(
            variables,
            consts,
            _model_input(batch),
            batch["center"],
            batch["scale"],
            batch["bbox_height"],
            batch["orig_shape"],
            batch["bbox_info"],
            train=True,
            meta_masks=batch.get("meta_mask"),
            rngs={"dropout": rng},
            mutable=["batch_stats"],
        )
        losses = whmr_loss(
            cfg, preds, batch, gt_vertices, gt_sub, gt_temp,
            uvia_gt=uvia_gt, depth_gt=depth_gt,
        )
        return losses["loss"], (losses, mutated["batch_stats"])

    (_, (losses, new_stats)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        params
    )
    return grads, losses, new_stats


def train_step(
    cfg: WHMRConfig,
    model: WHMR,
    state: TrainState,
    consts: BodyConsts,
    batch: Dict[str, jnp.ndarray],
    rng: jax.Array,
    render_consts=None,
) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
    """One optimization step. Jit with cfg/model static (both hashable)."""
    grads, losses, new_stats = _microbatch_grads(
        cfg, model, state.params, state.batch_stats, consts, batch, rng,
        render_consts=render_consts,
    )
    new_state = state.apply_gradients(grads, new_stats)
    metrics = {k: v for k, v in losses.items()}
    metrics["grad_norm"] = optax.global_norm(grads)
    return new_state, metrics


def train_step_accum(
    cfg: WHMRConfig,
    model: WHMR,
    state: TrainState,
    consts: BodyConsts,
    batches: Dict[str, jnp.ndarray],
    rng: jax.Array,
    render_consts=None,
) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
    """Gradient accumulation: one optimizer step from K sequential
    microbatches (net-new vs the reference, which has no equivalent).

    `batches` leaves are shaped (K, micro, ...) — the trainer reshapes the
    loader batch host-side so each microbatch keeps its 'data'-axis
    sharding without an in-graph reshard. Gradients and loss metrics are
    AVERAGED over the K microbatches — the same mean-of-per-group-means
    convention the reference's DDP all-reduce applies across ranks
    (trainer.py:614), so masked-mean losses weight each microbatch
    equally regardless of its valid count. BatchNorm stats chain
    sequentially (microbatch i+1 normalizes with stats updated by i);
    activation memory per step drops ~K× while the effective batch stays
    K·micro."""

    def body(carry, xs):
        stats, gsum, lsum = carry
        mb, i = xs
        grads, losses, new_stats = _microbatch_grads(
            cfg, model, state.params, stats, consts, mb,
            jax.random.fold_in(rng, i), render_consts=render_consts,
        )
        gsum = jax.tree_util.tree_map(jnp.add, gsum, grads)
        lsum = jax.tree_util.tree_map(jnp.add, lsum, losses)
        return (new_stats, gsum, lsum), None

    accum = jax.tree_util.tree_leaves(batches)[0].shape[0]
    zeros_g = jax.tree_util.tree_map(jnp.zeros_like, state.params)
    # loss dict structure is static: probe it with microbatch 0's shapes
    zeros_l = jax.eval_shape(
        lambda: _microbatch_grads(
            cfg, model, state.params, state.batch_stats, consts,
            jax.tree_util.tree_map(lambda v: v[0], batches), rng,
            render_consts=render_consts,
        )[1]
    )
    zeros_l = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), zeros_l
    )
    (new_stats, gsum, lsum), _ = jax.lax.scan(
        body,
        (state.batch_stats, zeros_g, zeros_l),
        (batches, jnp.arange(accum)),
    )
    inv = 1.0 / accum
    grads = jax.tree_util.tree_map(lambda g: g * inv, gsum)
    new_state = state.apply_gradients(grads, new_stats)
    metrics = {k: v * inv for k, v in lsum.items()}
    metrics["grad_norm"] = optax.global_norm(grads)
    return new_state, metrics


def create_hmr_train_state(
    cfg: WHMRConfig,
    model,
    consts: BodyConsts,
    rng: jax.Array,
    example_x: jnp.ndarray,
    steps_per_epoch: int = 1,
) -> TrainState:
    """TrainState for the plain HMR baseline (`--regressor hmr`,
    reference core/train_options.py:19-20) — same optimizer/EMA machinery
    as the pymaf state, simpler init signature (image only)."""
    variables = jax.jit(
        lambda c, x: model.init(
            {"params": rng, "dropout": jax.random.fold_in(rng, 1)},
            c, x, train=False,
        )
    )(consts, example_x)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", FrozenDict())
    tx = make_optimizer(cfg, steps_per_epoch=steps_per_epoch)
    ema_decay = float(cfg.train.ema_decay)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        tx=tx,
        ema_params=(jax.tree_util.tree_map(jnp.array, params)
                    if ema_decay > 0 else None),
        ema_decay=ema_decay,
    )


def hmr_train_step(
    cfg: WHMRConfig,
    model,
    state: TrainState,
    consts: BodyConsts,
    batch: Dict[str, jnp.ndarray],
    rng: jax.Array,
    render_consts=None,
) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
    """One HMR-baseline optimization step (reference trainer.py:406-409 +
    the single-pass loss loop at :498-590). render_consts is accepted and
    ignored: HMR has no dense heads to supervise."""
    from whmr_tpu.ops.camera import weak_perspective_projection
    from whmr_tpu.training.losses import hmr_loss

    def loss_fn(params):
        variables = {"params": params, "batch_stats": state.batch_stats}
        (rotmat, betas, cam), mutated = model.apply(
            variables, consts, _model_input(batch), train=True,
            rngs={"dropout": rng}, mutable=["batch_stats"],
        )
        out = smpl_forward(consts.smpl, betas, rotmat)
        kp_2d = weak_perspective_projection(out.joints, cam, cfg.img_res)
        losses = hmr_loss(cfg, rotmat, betas, cam, kp_2d, out.joints, batch)
        return losses["loss"], (losses, mutated["batch_stats"])

    (_, (losses, new_stats)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        state.params
    )
    new_state = state.apply_gradients(grads, new_stats)
    metrics = {k: v for k, v in losses.items()}
    metrics["grad_norm"] = optax.global_norm(grads)
    return new_state, metrics


def make_jitted_train_step(
    cfg: WHMRConfig, model: WHMR, mesh=None, donate: bool = True,
    render_consts=None, accum: int = 1, regressor: str = "pymaf_net",
):
    """Partial + jit with batch sharded over 'data' and state replicated/TP.

    Returns fn(state, consts, batch, rng) -> (state, metrics). With
    accum > 1 the batch must arrive shaped (accum, micro, ...) and is
    sharded over 'data' on the MICRO axis (see train_step_accum).
    regressor="hmr" selects the single-pass HMR-baseline step (no grad
    accumulation support — the baseline fits memory trivially).
    """
    if regressor == "hmr":
        if accum > 1:
            raise ValueError("--grad_accum is not supported with --regressor hmr")
        fn = hmr_train_step
    else:
        fn = train_step_accum if accum > 1 else train_step
    step = functools.partial(fn, cfg, model, render_consts=render_consts)
    kwargs = {}
    if donate:
        kwargs["donate_argnums"] = (0,)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        spec = P(None, "data") if accum > 1 else P("data")
        data = NamedSharding(mesh, spec)
        kwargs["in_shardings"] = (
            None,  # state: leave placement as-is (replicated or TP-sharded)
            None,  # consts
            data,  # batch
            None,  # rng
        )
    return jax.jit(step, **kwargs)
