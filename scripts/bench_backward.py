"""Backward-pass segment bench on the real TPU at the reference batch.

The aux-on train step at B=64 is 140 ms of which only ~58 ms is fwd+loss
(scripts/bench_train.py bisect_aux): ~82 ms is backward + optimizer. This
bench times each model segment fwd vs fwd+bwd to locate the backward fat,
and compares the ConvTranspose deconv pyramid against a mathematically
equivalent pixel-shuffle formulation (Conv k2 -> depth-to-space has
identical FLOPs but avoids XLA's input-dilated convolution lowering).

Usage: python scripts/bench_backward.py [segment|all] [batch]
Segments: vit deconv ps_deconv heads smpl adam
"""

import json
import sys
import time


def _timeit(fn, *args, iters, reps=3):
    float(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        float(fn(*args))
    return (time.perf_counter() - t0) / (reps * iters)


def _report(name, dt, batch):
    print(json.dumps({
        "metric": f"bwd_bench_ms_{name}", "value": round(dt * 1e3, 2),
        "unit": "ms", "batch": batch,
    }))


def _run_pair(model_apply, params, x, iters, batch, name, extra=()):
    """Times fwd and fwd+bwd of scalar-reduced apply."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    def scalar(p, x):
        return jnp.sum(model_apply(p, x).astype(jnp.float32))

    @jax.jit
    def fwd(p, x):
        def body(i, carry):
            return carry + scalar(p, x + (carry * 0).astype(x.dtype))

        return lax.fori_loop(0, iters, body, jnp.float32(0))

    @jax.jit
    def fwdbwd(p, x):
        def body(i, carry):
            l, g = jax.value_and_grad(scalar)(p, x + (carry * 0).astype(x.dtype))
            leaves = jax.tree_util.tree_leaves(g)
            return carry + l + sum(jnp.sum(t.astype(jnp.float32)) for t in leaves)

        return lax.fori_loop(0, iters, body, jnp.float32(0))

    dt_f = _timeit(fwd, params, x, iters=iters)
    _report(f"{name}_fwd", dt_f, batch)
    dt_fb = _timeit(fwdbwd, params, x, iters=iters)
    _report(f"{name}_fwdbwd", dt_fb, batch)
    return dt_f, dt_fb


def bench_vit(batch):
    import jax
    import jax.numpy as jnp

    from whmr_tpu.config import WHMRConfig
    from whmr_tpu.models.vit import ViTBackbone

    cfg = WHMRConfig()
    model = ViTBackbone(cfg.vit, dtype=jnp.bfloat16)
    x = jnp.zeros((batch, *cfg.img_res[::-1], 3), jnp.bfloat16)
    params = jax.jit(lambda x: model.init(jax.random.PRNGKey(0), x, train=False))(x)

    def apply(p, x):
        return model.apply(p, x, train=False)

    _run_pair(apply, params, x, 10, batch, "vit")


def _make_deconv_tower(pixel_shuffle: bool, with_heads: bool):
    import flax.linen as nn
    import jax.numpy as jnp

    from whmr_tpu.models.heads import DepthHead, IUVHead
    from whmr_tpu.models.layers import DeconvBlock

    class PSDeconvBlock(nn.Module):
        """Conv k2 s1 producing 4F channels -> depth-to-space: identical
        FLOPs/receptive field to ConvTranspose(k4 s2 SAME), exact weight
        remap exists (each output phase sees a 2x2 window of the input)."""

        features: int

        @nn.compact
        def __call__(self, x, train=False):
            b, h, w, _ = x.shape
            f = self.features
            y = nn.Conv(4 * f, (2, 2), padding=((1, 1), (1, 1)),
                        use_bias=False, dtype=jnp.bfloat16)(x)
            y = y.reshape(b, h + 1, w + 1, 2, 2, f)
            y = y.transpose(0, 1, 3, 2, 4, 5).reshape(b, 2 * (h + 1), 2 * (w + 1), f)
            y = y[:, 1:-1, 1:-1]
            y = nn.BatchNorm(use_running_average=True, momentum=0.9,
                             dtype=jnp.bfloat16)(y)
            return nn.relu(y)

    class Tower(nn.Module):
        @nn.compact
        def __call__(self, x):
            for _ in range(3):
                if pixel_shuffle:
                    x = PSDeconvBlock(256)(x)
                else:
                    x = DeconvBlock(256, dtype=jnp.bfloat16)(x, train=False)
            outs = [x]
            if with_heads:
                outs.append(IUVHead(dtype=jnp.bfloat16)(x)["predict_ann_index"])
                outs.append(DepthHead(dtype=jnp.bfloat16)(x))
            return sum(jnp.sum(o.astype(jnp.float32)) for o in outs)

    return Tower()


def bench_deconv(batch, pixel_shuffle=False, with_heads=True):
    import jax
    import jax.numpy as jnp

    tower = _make_deconv_tower(pixel_shuffle, with_heads)
    x = jnp.zeros((batch, 16, 12, 768), jnp.bfloat16)
    params = jax.jit(lambda x: tower.init(jax.random.PRNGKey(0), x))(x)

    def apply(p, x):
        return tower.apply(p, x)

    name = "ps_deconv" if pixel_shuffle else "deconv"
    if not with_heads:
        name += "_bare"
    _run_pair(apply, params, x, 10, batch, name)


def bench_smpl(batch):
    """ONE SMPL forward+LBS backward (the train step runs ~6: GT + init +
    3 stages + world; multiply accordingly when attributing step time)."""
    import jax
    import jax.numpy as jnp

    from whmr_tpu.data.assets import synthetic_smpl_assets
    from whmr_tpu.models.regressor import body_consts_from_assets
    from whmr_tpu.models.smpl import smpl_forward

    consts = body_consts_from_assets(synthetic_smpl_assets())
    rot = jnp.broadcast_to(jnp.eye(3), (batch, 24, 3, 3))
    betas = jnp.zeros((batch, 10))

    def apply(p, x):
        out = smpl_forward(consts.smpl, p["betas"], p["rot"] + x * 0)
        return jnp.sum(out.vertices) + jnp.sum(out.joints)

    _run_pair(apply, {"betas": betas, "rot": rot}, jnp.float32(0), 10, batch, "smpl1x")


def bench_adam(batch):
    """Adam update + grad_norm on the real WHMR param tree (B-independent)."""
    import jax
    import jax.numpy as jnp
    import optax
    from jax import lax

    from whmr_tpu.config import WHMRConfig
    from whmr_tpu.data.assets import synthetic_smpl_assets
    from whmr_tpu.models.regressor import body_consts_from_assets
    from whmr_tpu.models.whmr import WHMR
    from whmr_tpu.training.train_step import create_train_state
    from whmr_tpu.utils.testing import make_example_inputs

    cfg = WHMRConfig()
    model = WHMR(cfg, dtype=jnp.bfloat16)
    inp = make_example_inputs(cfg, 1)
    state = create_train_state(
        cfg, model, consts := body_consts_from_assets(synthetic_smpl_assets()),
        jax.random.PRNGKey(0), {k: jnp.asarray(v) for k, v in inp.items()},
    )
    iters = 10

    @jax.jit
    def run(state):
        def body(carry, _):
            st, tok = carry
            grads = jax.tree_util.tree_map(
                lambda p: (p * 0 + tok).astype(p.dtype), st.params
            )
            st = st.apply_gradients(grads, st.batch_stats)
            gn = optax.global_norm(grads)
            return (st, tok + gn * 0 + 1e-9), None

        (st, tok), _ = lax.scan(body, (state, jnp.float32(0)), None, length=iters)
        return tok + jax.tree_util.tree_leaves(st.params)[0].astype(jnp.float32).sum()

    dt = _timeit(run, state, iters=iters)
    _report("adam_update", dt, batch)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    if which in ("vit", "all"):
        bench_vit(batch)
    if which in ("deconv", "all"):
        bench_deconv(batch, pixel_shuffle=False)
    if which in ("ps_deconv", "all"):
        bench_deconv(batch, pixel_shuffle=True)
    if which in ("deconv_bare", "all"):
        bench_deconv(batch, pixel_shuffle=False, with_heads=False)
        bench_deconv(batch, pixel_shuffle=True, with_heads=False)
    if which in ("smpl", "all"):
        bench_smpl(batch)
    if which in ("adam", "all"):
        bench_adam(batch)


if __name__ == "__main__":
    main()
