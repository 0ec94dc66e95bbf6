"""Training-path microbench on the real TPU: GT render + full train step.

Usage: python scripts/bench_train.py [render|step|all] [batch]

Prints one JSON line per measurement. Methodology matches bench.py: K
iterations chained inside one jit via a data-dependent carry, scalar
readback for synchronization (the axon tunnel's block_until_ready is a
no-op), params/consts passed as jit arguments.
"""

import json
import sys
import time


def _timeit(fn, *args, iters, reps=3):
    float(fn(*args))  # compile + warm
    t0 = time.perf_counter()
    for _ in range(reps):
        float(fn(*args))
    return (time.perf_counter() - t0) / (reps * iters)


def bench_render(batch: int):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    from whmr_tpu.data.assets import synthetic_smpl_assets
    from whmr_tpu.models.smpl import smpl_forward
    from whmr_tpu.models.regressor import body_consts_from_assets
    from whmr_tpu.ops.rasterizer import project_weak_perspective_to_pixels
    from whmr_tpu.ops.rasterizer_pallas import rasterize_pallas
    from whmr_tpu.training.gt_renderer import build_render_consts

    assets = synthetic_smpl_assets()
    consts = body_consts_from_assets(assets)
    rng = np.random.RandomState(0)
    pose = jnp.asarray((rng.randn(batch, 24, 3) * 0.2).astype(np.float32))
    betas = jnp.asarray((rng.randn(batch, 10) * 0.5).astype(np.float32))
    cam = jnp.asarray(
        np.stack(
            [
                rng.uniform(0.7, 1.1, batch),
                rng.uniform(-0.1, 0.1, batch),
                rng.uniform(-0.1, 0.1, batch),
            ],
            axis=-1,
        ).astype(np.float32)
    )
    rc = build_render_consts(assets)  # KD-sorted faces

    def spatial_sort_unsorted(c):
        # locality-free baseline: the same render topology in a random
        # face order (the raw SMPL faces no longer apply — render faces
        # index the duplicated part-pure vertex set).
        f = np.asarray(c.faces).copy()
        np.random.RandomState(3).shuffle(f)
        return f

    iters = 20

    def make_bench(faces, chunk, prep_only=False, tile_p=1024, pooled=False,
                   vmap_idx=None):
        @jax.jit
        def run(smpl_c, iuv, pose, betas, cam, pool=None):
            from whmr_tpu.ops.rotation import batch_rodrigues

            rm = batch_rodrigues(pose.reshape(-1, 3)).reshape(-1, 24, 3, 3)
            verts = smpl_forward(smpl_c, betas, rm).vertices
            if pooled:
                # gt_render_mesh="sub": rasterize the dmap0-pooled verts
                # (the train step reuses its existing gt_sub einsum).
                verts = jnp.einsum("sv,bvk->bsk", pool, verts)
            if vmap_idx is not None:
                # part-pure render topology: gather source verts onto the
                # duplicated render vertex set (gt_renderer.vertex_map).
                verts = jnp.take(verts, jnp.asarray(vmap_idx), axis=1)
            attrs = jnp.broadcast_to(iuv[None], (batch, *iuv.shape))

            def body(i, carry):
                vp, vz = project_weak_perspective_to_pixels(
                    verts + (carry * 0), cam, (128, 128)
                )
                if prep_only:
                    from whmr_tpu.ops.rasterizer import _face_chunks
                    from whmr_tpu.ops.rasterizer_pallas import _face_tables

                    fp = _face_chunks(faces, chunk).reshape(-1, 3)
                    tabs = _face_tables(vp, vz, attrs, jnp.asarray(fp))
                    return carry + sum(jnp.sum(t) for t in tabs[:3])
                out = rasterize_pallas(
                    vp, vz, attrs, faces, resolution=(128, 128), chunk=chunk,
                    tile_p=tile_p,
                )
                return carry + jnp.sum(out.attrs)

            return lax.fori_loop(0, iters, body, jnp.float32(0))

        return run

    fk = np.asarray(rc.faces)
    # Sweep record (v5e, B=32, 128x128, KD-sorted): (tile_p, chunk) ->
    # (1024,256) 44.1 / (512,512) 23.0 / (512,1024) 19.7 / (256,1024) 13.7 /
    # (128,1024) 11.8 / (64,1024) 12.6 / (128,768) 11.9 ms; unsorted@default
    # 45.9; prep-only (XLA face tables) 2.2 ms.
    rc_sub = build_render_consts(assets, mesh="sub")
    pool = jnp.asarray(assets.dmap0)
    variants = [
        ("kd_default", fk, 1024, False, 128, rc.vertex_iuv, None,
         rc.vertex_map),
        ("unsorted_default", spatial_sort_unsorted(rc), 1024, False, 128,
         rc.vertex_iuv, None, rc.vertex_map),
        ("prep_only", fk, 1024, True, 128, rc.vertex_iuv, None,
         rc.vertex_map),
        ("kd_sub", np.asarray(rc_sub.faces), 1024, False, 128,
         rc_sub.vertex_iuv, pool, rc_sub.vertex_map),
    ]
    for name, faces, chunk, prep, tp, iuv, pl, vm in variants:
        args = (consts.smpl, iuv, pose, betas, cam)
        if pl is not None:
            args = args + (pl,)
        dt = _timeit(
            make_bench(faces, chunk, prep, tp, pooled=pl is not None,
                       vmap_idx=vm),
            *args, iters=iters,
        )
        print(json.dumps({
            "metric": f"gt_render_ms_{name}", "value": round(dt * 1e3, 2),
            "unit": "ms", "batch": batch,
        }))


def _make_keypoints_consistent(consts, batch_np, batch: int):
    """Replace the random 2D keypoints with geometrically-consistent ones
    (GT joints projected through a plausible crop camera): the GT-camera
    LSQ then recovers a sane body-sized projection, which is what real
    training data gives the rasterizer's tile culling. Random keypoints
    produce degenerate cameras that defeat culling (measured 38 ms vs
    12 ms GT render) and would misattribute render cost in any bench."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from whmr_tpu.config import FOCAL_LENGTH
    from whmr_tpu.models.smpl import smpl_forward
    from whmr_tpu.ops.rotation import batch_rodrigues

    @jax.jit
    def gt_joints(smpl_c, pose, betas):
        rm = batch_rodrigues(pose.reshape(-1, 3)).reshape(-1, 24, 3, 3)
        return smpl_forward(smpl_c, betas, rm).joints

    joints = np.asarray(
        gt_joints(consts.smpl, jnp.asarray(batch_np["pose"]), jnp.asarray(batch_np["betas"]))
    )
    rng_np = np.random.RandomState(7)
    s = rng_np.uniform(0.7, 1.1, (batch, 1, 1))
    t = np.concatenate(
        [
            rng_np.uniform(-0.1, 0.1, (batch, 1, 2)),
            2.0 * FOCAL_LENGTH / (256.0 * s),
        ],
        axis=-1,
    )
    pj = joints + t
    pix = FOCAL_LENGTH * pj[..., :2] / pj[..., 2:3] + 128.0
    batch_np["keypoints"] = np.concatenate(
        [2.0 * pix / 256.0 - 1.0, np.ones((batch, joints.shape[1], 1))], -1
    ).astype(np.float32)
    return batch_np


def bench_step(
    batch: int, aux: bool, depth: bool | None = None, tag: str = "",
    fused_adam: bool = False, attn_impl: str | None = None,
    gt_mesh: str = "full",
):
    import jax
    import jax.numpy as jnp
    from jax import lax
    from dataclasses import replace

    from whmr_tpu.config import WHMRConfig
    from whmr_tpu.data.assets import synthetic_smpl_assets
    from whmr_tpu.models.regressor import body_consts_from_assets
    from whmr_tpu.models.whmr import WHMR
    from whmr_tpu.training.gt_renderer import build_render_consts
    from whmr_tpu.training.train_step import create_train_state, train_step
    from whmr_tpu.utils.testing import make_example_train_batch, make_example_inputs

    cfg = WHMRConfig()
    cfg = replace(
        cfg,
        pymaf=replace(
            cfg.pymaf, aux_supv_on=aux,
            depth_supv_on=aux if depth is None else depth,
            gt_render_mesh=gt_mesh,
        ),
        train=replace(cfg.train, fused_adam=fused_adam),
    )
    if attn_impl is not None:
        cfg = replace(cfg, vit=replace(cfg.vit, attn_impl=attn_impl))
    assets = synthetic_smpl_assets()
    consts = body_consts_from_assets(assets)
    rc = build_render_consts(assets, mesh=gt_mesh)
    model = WHMR(cfg, dtype=jnp.bfloat16)
    inp = make_example_inputs(cfg, batch)
    state = create_train_state(
        cfg, model, consts, jax.random.PRNGKey(0),
        {k: jnp.asarray(v) for k, v in inp.items()},
    )
    batch_np = _make_keypoints_consistent(
        consts, make_example_train_batch(cfg, batch), batch
    )
    batch_d = {k: jnp.asarray(v) for k, v in batch_np.items()}
    iters = 5

    @jax.jit
    def run(state, consts, batch, rng):
        def body(i, carry):
            st, tok = carry
            # EVERY batch field must depend on the carry, not just img:
            # pose/betas/keypoints feed the GT-supervision branch
            # (rodrigues -> GT SMPL -> LSQ camera -> render), which is
            # state-independent — leaving them loop-invariant lets XLA's
            # while-loop LICM hoist the whole GT side out of the timed
            # loop (the same hazard bench.py guards for CamCalib).
            z = tok * 0
            b = {k: v + z.astype(v.dtype) for k, v in batch.items()}
            st, metrics = train_step(
                cfg, model, st, consts, b, rng, render_consts=rc
            )
            return st, tok + metrics["loss"].astype(jnp.float32)

        _, tok = lax.fori_loop(0, iters, body, (state, jnp.float32(0)))
        return tok

    dt = _timeit(run, state, consts, batch_d, jax.random.PRNGKey(1), iters=iters)
    name = tag or f"aux_{'on' if aux else 'off'}"
    print(json.dumps({
        "metric": f"train_step_ms_{name}",
        "value": round(dt * 1e3, 1), "unit": "ms", "batch": batch,
        "crops_per_sec": round(batch / dt, 1),
    }))


def bench_bisect(batch: int):
    """Forward-only vs forward+loss vs full step, aux on/off: locates where
    the aux-supervision train-step cost lives (fwd / loss / backward)."""
    import jax
    import jax.numpy as jnp
    from jax import lax
    from dataclasses import replace

    from whmr_tpu.config import WHMRConfig
    from whmr_tpu.data.assets import synthetic_smpl_assets
    from whmr_tpu.models.regressor import body_consts_from_assets
    from whmr_tpu.models.whmr import WHMR
    from whmr_tpu.training.gt_renderer import build_render_consts
    from whmr_tpu.training.train_step import create_train_state
    from whmr_tpu.utils.testing import make_example_train_batch, make_example_inputs

    assets = synthetic_smpl_assets()
    consts = body_consts_from_assets(assets)
    rc = build_render_consts(assets)
    batch_np = _make_keypoints_consistent(
        consts, make_example_train_batch(WHMRConfig(), batch), batch
    )
    batch_d = {k: jnp.asarray(v) for k, v in batch_np.items()}
    iters = 10

    for aux in (False, True):
        cfg = replace(
            WHMRConfig(),
            pymaf=replace(WHMRConfig().pymaf, aux_supv_on=aux, depth_supv_on=aux),
        )
        model = WHMR(cfg, dtype=jnp.bfloat16)
        inp = make_example_inputs(cfg, batch)
        state = create_train_state(
            cfg, model, consts, jax.random.PRNGKey(0),
            {k: jnp.asarray(v) for k, v in inp.items()},
        )

        def fwd_loss(params, stats, consts, b, rng, with_loss):
            from whmr_tpu.models.smpl import smpl_forward
            from whmr_tpu.ops.rotation import batch_rodrigues
            from whmr_tpu.training.losses import whmr_loss

            variables = {"params": params, "batch_stats": stats}
            preds, _ = model.apply(
                variables, consts, b["img"], b["center"], b["scale"],
                b["bbox_height"], b["orig_shape"], b["bbox_info"], train=True,
                meta_masks=b.get("meta_mask"), rngs={"dropout": rng},
                mutable=["batch_stats"],
            )
            if not with_loss:
                return sum(
                    jnp.sum(s["verts"].astype(jnp.float32)) for s in preds["smpl_out"]
                )
            gt_rotmats = batch_rodrigues(b["pose"].reshape(-1, 3)).reshape(-1, 24, 3, 3)
            gt_out = smpl_forward(consts.smpl, b["betas"], gt_rotmats)
            gt_vertices = gt_out.vertices
            gt_sub = jnp.einsum("sv,bvk->bsk", consts.dmap0, gt_vertices)
            gt_temp = jnp.einsum("ts,bsk->btk", consts.dmap1, gt_sub)
            uvia_gt = depth_gt = None
            if aux:
                from whmr_tpu.config import FOCAL_LENGTH
                from whmr_tpu.ops.camera import estimate_translation
                from whmr_tpu.ops.iuv import iuv_img2map
                from whmr_tpu.training.gt_renderer import (
                    gt_camera_from_cam_t, render_gt_maps,
                )

                w, h = cfg.img_res
                kp_orig = b["keypoints"].at[..., :2].set(
                    0.5 * h * (b["keypoints"][..., :2] + 1.0)
                )
                t = estimate_translation(gt_out.joints, kp_orig, FOCAL_LENGTH, (float(w), float(h)))
                maps = render_gt_maps(
                    rc, gt_vertices, gt_camera_from_cam_t(t),
                    heatmap_size=cfg.pymaf.dp_heatmap_size,
                    vitpose_slice=True, with_depth=True, valid=b["has_smpl"],
                )
                uvia_gt = iuv_img2map(maps["iuv_image_gt"])
                depth_gt = maps["depth_image_gt"]
            losses = whmr_loss(cfg, preds, b, gt_vertices, gt_sub, gt_temp,
                               uvia_gt=uvia_gt, depth_gt=depth_gt)
            return losses["loss"]

        for with_loss in (False, True):
            @jax.jit
            def run(params, stats, consts, b, rng):
                def body(i, carry):
                    # every field carry-dependent: see bench_step's LICM note
                    z = carry * 0
                    bb = {k: v + z.astype(v.dtype) for k, v in b.items()}
                    return carry + fwd_loss(params, stats, consts, bb, rng, with_loss)

                return lax.fori_loop(0, iters, body, jnp.float32(0))

            dt = _timeit(
                run, state.params, state.batch_stats, consts, batch_d,
                jax.random.PRNGKey(1), iters=iters,
            )
            tag = f"{'fwdloss' if with_loss else 'fwd'}_aux_{'on' if aux else 'off'}"
            print(json.dumps({
                "metric": f"bisect_ms_{tag}", "value": round(dt * 1e3, 1),
                "unit": "ms", "batch": batch,
            }))


def bench_bisect_aux(batch: int):
    """Splits the aux-on fwd+loss delta INSIDE the real graph: (a) full,
    (b) render consumed by sum() but losses aux-off, (c) aux losses fed
    from constant maps (no render). Locates whether the cost is the
    in-graph render or the CE/huber loss terms themselves."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax
    from dataclasses import replace

    from whmr_tpu.config import WHMRConfig, FOCAL_LENGTH
    from whmr_tpu.data.assets import synthetic_smpl_assets
    from whmr_tpu.models.regressor import body_consts_from_assets
    from whmr_tpu.models.whmr import WHMR
    from whmr_tpu.training.gt_renderer import build_render_consts
    from whmr_tpu.training.train_step import create_train_state
    from whmr_tpu.utils.testing import make_example_train_batch, make_example_inputs

    assets = synthetic_smpl_assets()
    consts = body_consts_from_assets(assets)
    rc = build_render_consts(assets)
    batch_np = _make_keypoints_consistent(
        consts, make_example_train_batch(WHMRConfig(), batch), batch
    )
    batch_d = {k: jnp.asarray(v) for k, v in batch_np.items()}
    iters = 10
    cfg = replace(
        WHMRConfig(),
        pymaf=replace(WHMRConfig().pymaf, aux_supv_on=True, depth_supv_on=True),
    )
    model = WHMR(cfg, dtype=jnp.bfloat16)
    inp = make_example_inputs(cfg, batch)
    state = create_train_state(
        cfg, model, consts, jax.random.PRNGKey(0),
        {k: jnp.asarray(v) for k, v in inp.items()},
    )
    rng_np = np.random.RandomState(3)
    hs = cfg.pymaf.dp_heatmap_size
    const_maps = {
        "iuv": jnp.asarray(rng_np.rand(batch, hs[0], hs[1] - 32, 3).astype(np.float32)),
        "depth": jnp.asarray(rng_np.rand(batch, hs[0], hs[1] - 32, 1).astype(np.float32)),
    }

    def fwd_loss(params, stats, consts, b, rng, mode):
        from whmr_tpu.models.smpl import smpl_forward
        from whmr_tpu.ops.rotation import batch_rodrigues
        from whmr_tpu.ops.camera import estimate_translation
        from whmr_tpu.ops.iuv import iuv_img2map
        from whmr_tpu.training.gt_renderer import (
            gt_camera_from_cam_t, render_gt_maps,
        )
        from whmr_tpu.training.losses import whmr_loss

        variables = {"params": params, "batch_stats": stats}
        preds, _ = model.apply(
            variables, consts, b["img"], b["center"], b["scale"],
            b["bbox_height"], b["orig_shape"], b["bbox_info"], train=True,
            meta_masks=b.get("meta_mask"), rngs={"dropout": rng},
            mutable=["batch_stats"],
        )
        gt_rotmats = batch_rodrigues(b["pose"].reshape(-1, 3)).reshape(-1, 24, 3, 3)
        gt_out = smpl_forward(consts.smpl, b["betas"], gt_rotmats)
        gt_vertices = gt_out.vertices
        gt_sub = jnp.einsum("sv,bvk->bsk", consts.dmap0, gt_vertices)
        gt_temp = jnp.einsum("ts,bsk->btk", consts.dmap1, gt_sub)
        extra = jnp.float32(0)
        uvia_gt = depth_gt = None
        if mode in ("full", "render_only"):
            w, h = cfg.img_res
            kp_orig = b["keypoints"].at[..., :2].set(
                0.5 * h * (b["keypoints"][..., :2] + 1.0)
            )
            t = estimate_translation(gt_out.joints, kp_orig, FOCAL_LENGTH, (float(w), float(h)))
            maps = render_gt_maps(
                rc, gt_vertices, gt_camera_from_cam_t(t),
                heatmap_size=cfg.pymaf.dp_heatmap_size,
                vitpose_slice=True, with_depth=True, valid=b["has_smpl"],
            )
            if mode == "render_only":
                extra = sum(jnp.sum(v) for v in maps.values())
            else:
                uvia_gt = iuv_img2map(maps["iuv_image_gt"])
                depth_gt = maps["depth_image_gt"]
        elif mode == "loss_only":
            uvia_gt = iuv_img2map(const_maps["iuv"])
            depth_gt = const_maps["depth"]
        losses = whmr_loss(cfg, preds, b, gt_vertices, gt_sub, gt_temp,
                           uvia_gt=uvia_gt, depth_gt=depth_gt)
        return losses["loss"] + extra

    for mode in ("full", "render_only", "loss_only"):
        @jax.jit
        def run(params, stats, consts, b, rng):
            def body(i, carry):
                # every field carry-dependent: see bench_step's LICM note
                z = carry * 0
                bb = {k: v + z.astype(v.dtype) for k, v in b.items()}
                return carry + fwd_loss(params, stats, consts, bb, rng, mode)

            return lax.fori_loop(0, iters, body, jnp.float32(0))

        dt = _timeit(
            run, state.params, state.batch_stats, consts, batch_d,
            jax.random.PRNGKey(1), iters=iters,
        )
        print(json.dumps({
            "metric": f"bisect_aux_ms_{mode}", "value": round(dt * 1e3, 1),
            "unit": "ms", "batch": batch,
        }))


def bench_parts(batch: int):
    """Isolated costs of the aux-supervision pieces around the render."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    from whmr_tpu.data.assets import synthetic_smpl_assets
    from whmr_tpu.models.regressor import body_consts_from_assets
    from whmr_tpu.models.smpl import smpl_forward
    from whmr_tpu.ops.camera import estimate_translation
    from whmr_tpu.ops.iuv import iuv_img2map
    from whmr_tpu.ops.rotation import batch_rodrigues

    assets = synthetic_smpl_assets()
    consts = body_consts_from_assets(assets)
    rng = np.random.RandomState(0)
    pose = jnp.asarray((rng.randn(batch, 72) * 0.2).astype(np.float32))
    betas = jnp.asarray((rng.randn(batch, 10) * 0.5).astype(np.float32))
    kp = jnp.asarray(
        np.concatenate(
            [rng.uniform(0, 256, (batch, 49, 2)), np.ones((batch, 49, 1))], -1
        ).astype(np.float32)
    )
    iuv_img = jnp.asarray(rng.rand(batch, 128, 96, 3).astype(np.float32))
    iters = 50

    @jax.jit
    def lsq(smpl_c, pose, betas, kp):
        rm = batch_rodrigues(pose.reshape(-1, 3)).reshape(-1, 24, 3, 3)
        joints = smpl_forward(smpl_c, betas, rm).joints

        def body(i, carry):
            t = estimate_translation(
                joints + carry * 0, kp, 1000.0, (256.0, 256.0)
            )
            return carry + jnp.sum(t)

        return lax.fori_loop(0, iters, body, jnp.float32(0))

    @jax.jit
    def encode(img):
        def body(i, carry):
            m = iuv_img2map(img + carry * 0)
            return carry + sum(jnp.sum(v) for v in m.values())

        return lax.fori_loop(0, iters, body, jnp.float32(0))

    for name, fn, args in (
        ("lsq_translation", lsq, (consts.smpl, pose, betas, kp)),
        ("iuv_img2map", encode, (iuv_img,)),
    ):
        dt = _timeit(fn, *args, iters=iters)
        print(json.dumps({
            "metric": f"part_ms_{name}", "value": round(dt * 1e3, 2),
            "unit": "ms", "batch": batch,
        }))


def main():
    from whmr_tpu.utils.profiling import enable_compile_cache

    enable_compile_cache()
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    if which in ("render", "all"):
        bench_render(batch)
    if which in ("step", "all"):
        bench_step(batch, aux=True)
        bench_step(batch, aux=False)
    if which == "step_fused":
        bench_step(batch, aux=True, tag="aux_on_fused_adam", fused_adam=True)
    if which == "step_bf16sm":
        bench_step(batch, aux=True, tag="aux_on_bf16sm", attn_impl="bf16sm")
    if which == "step_submesh":
        bench_step(batch, aux=True, tag="aux_on_submesh", gt_mesh="sub")
    if which == "ablate":
        bench_step(batch, aux=True, depth=False, tag="iuv_only")
        bench_step(batch, aux=False, depth=True, tag="depth_only")
    if which == "parts":
        bench_parts(batch)
    if which == "bisect":
        bench_bisect(batch)
    if which == "bisect_aux":
        bench_bisect_aux(batch)


if __name__ == "__main__":
    main()
