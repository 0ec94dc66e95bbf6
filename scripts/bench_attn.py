"""Attention-impl microbench: full ViT-B tower on the real TPU.

Usage: python scripts/bench_attn.py [batch] [impl,impl,...] [train]

Sweeps models/layers.Attention `impl` variants inside the real 12-block
ViTBackbone (bf16, 256x192 -> 192 tokens) with one shared param tree —
the impls differ only in the inner attention formulation, so params are
interchangeable. Chained-in-jit timing (see bench.py methodology notes).

`train` switches to the fwd+bwd shape (value_and_grad of a scalar sum
over the tower at the training batch): the round-3 sweep covered only
the forward, leaving the "backward can't beat its roofline" claim
asserted rather than measured (VERDICT r3 weak item 7 / next item 7).

MEASURED (v5e, B=48, ms per tower forward) — see CLAUDE.md round-2 notes.
"""

import json
import sys
import time

from dataclasses import replace


def main():
    from whmr_tpu.utils.profiling import enable_compile_cache

    enable_compile_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    from whmr_tpu.config import ViTConfig
    from whmr_tpu.models.vit import ViTBackbone

    args = [a for a in sys.argv[1:]]
    train = "train" in args
    if train:
        args.remove("train")
    batch = int(args[0]) if args else 48
    iters = 8 if train else 20
    cfg = ViTConfig()
    x = jnp.asarray(
        np.random.RandomState(0).randn(batch, *cfg.img_size, 3).astype(np.float32)
    )

    model0 = ViTBackbone(cfg, dtype=jnp.bfloat16)
    variables = jax.jit(lambda xx: model0.init(jax.random.PRNGKey(0), xx))(x)

    outs = {}
    impls = args[1].split(",") if len(args) > 1 else (
        "einsum", "bhnd", "xla_dpa", "pallas", "split", "bf16sm",
    )
    mode = "train" if train else "fwd"
    for impl in impls:
        model = ViTBackbone(replace(cfg, attn_impl=impl), dtype=jnp.bfloat16)

        if train:
            # fwd+bwd: grads wrt params of a scalar reduction, the same
            # shape the train step runs (loss -> tower backward). The
            # grad-l2 readback depends on every gradient leaf, so the
            # whole backward is on the timed path.
            def loss_fn(v, xx):
                return jnp.sum(model.apply(v, xx).astype(jnp.float32))

            @jax.jit
            def chained(v, xx):
                def body(i, carry):
                    _, g = jax.value_and_grad(loss_fn)(
                        v, xx + (carry * 0).astype(xx.dtype)
                    )
                    leaves = jax.tree_util.tree_leaves(g)
                    return carry + sum(
                        jnp.sum(l.astype(jnp.float32) ** 2) for l in leaves
                    )

                return lax.fori_loop(0, iters, body, jnp.float32(0))
        else:

            @jax.jit
            def chained(v, xx):
                def body(i, carry):
                    out = model.apply(v, xx + (carry * 0).astype(xx.dtype))
                    return carry + jnp.sum(out.astype(jnp.float32))

                return lax.fori_loop(0, iters, body, jnp.float32(0))

        try:
            ref = float(chained(variables, x))  # compile + warm
        except Exception as e:  # record compile failures as data points
            print(json.dumps({
                "metric": f"vit_tower_{mode}_ms_{impl}", "error": str(e)[:200],
            }))
            continue
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            float(chained(variables, x))
        dt = (time.perf_counter() - t0) / (reps * iters)
        outs[impl] = ref / iters
        print(json.dumps({
            "metric": f"vit_tower_{mode}_ms_{impl}", "value": round(dt * 1e3, 2),
            "unit": "ms", "batch": batch,
        }))

    # Cross-impl numerical agreement (same params; bf16 tower, fp32 sums).
    base = outs.get("einsum")
    if base is not None:
        for impl, s in outs.items():
            rel = abs(s - base) / max(abs(base), 1e-9)
            print(json.dumps({"metric": f"checksum_rel_{impl}", "value": float(rel)}))


if __name__ == "__main__":
    main()
