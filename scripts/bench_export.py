"""Serving throughput of an exported AOT bundle (whmr-export output).

Usage: python scripts/bench_export.py BUNDLE_DIR [ITERS] [LOOPS]

Measures steady-state crops/s through the deserialized graph — the number
a serving deployment of the artifact sees, directly comparable to
bench.py's live-model headline (same methodology: ITERS chained calls
inside ONE jit to amortize the axon tunnel RTT, synced on a dependent
scalar readback; `exp.call` is traceable, so the chain jits like any fn).

The loop carry is folded into the IMAGE inputs and the returned scalar
sums the predicted vertices: every model input the verts depend on is
loop-carried, so XLA cannot hoist the forward out of the fori_loop as
loop-invariant (the hazard bench.py documents for the CamCalib ResNet).
"""

import sys
import time
from functools import partial

import numpy as np


def main() -> None:
    bundle = sys.argv[1]
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    loops = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    import jax
    import jax.numpy as jnp
    from jax import lax

    from whmr_tpu.inference.export import load_exported
    from whmr_tpu.utils.testing import make_example_inputs

    served = load_exported(bundle)
    if served.variant != "demo":
        raise SystemExit(
            f"{bundle} is a {served.variant!r}-variant bundle; this bench "
            "drives the demo serving signature (uint8 crops) — export "
            "without --eval"
        )
    b = served.batch_size or 48  # polymorphic bundle: bench at the optimum
    h, w = served.meta["crop_hw"]
    rng = np.random.RandomState(0)
    # the exported signature mirrors make_example_inputs' protocol layout
    from whmr_tpu.config import WHMRConfig

    inp = make_example_inputs(WHMRConfig(), b)
    args = [
        jnp.asarray(rng.randint(0, 255, (b, h, w, 3), np.uint8)),
        jnp.asarray(inp["center"]),
        jnp.asarray(inp["scale"]),
        jnp.asarray(inp["bbox_height"]),
        jnp.asarray(inp["orig_shape"]),
        jnp.asarray(inp["bbox_info"]),
    ]
    if served.camcalib:
        ch, cw = served.meta["cam_img_size"]
        args.append(jnp.asarray(rng.randint(0, 255, (1, ch, cw, 3), np.uint8)))

    @partial(jax.jit, static_argnums=0)
    def chain(n, weights, *a):
        def body(_i, carry):
            aa = list(a)
            # fold the carry into EVERY image input: iteration i+1's verts
            # then depend on iteration i, so the forward cannot be hoisted
            # out of the loop as invariant (carry*0 == 0, values unchanged)
            bump = (carry * 0).astype(aa[0].dtype)
            aa[0] = aa[0] + bump
            if served.camcalib:
                aa[-1] = aa[-1] + (carry * 0).astype(aa[-1].dtype)
            out = served.exported.call(weights, *aa)
            return (
                out["verts"].astype(jnp.float32).sum()
                + out["verts_world"].astype(jnp.float32).sum()
            )

        return lax.fori_loop(0, n, body, jnp.float32(0.0))

    # warm/compile the SAME (n=iters) program the timed loop runs — n is a
    # static arg, so warming with n=1 would pay a second full remote compile
    _ = float(chain(iters, served.weights, *args))
    print(f"[bench_export] warm on {jax.devices()[0].platform}; "
          f"batch={b} camcalib={served.camcalib}")

    best = float("inf")
    for _ in range(loops):
        t0 = time.perf_counter()
        _ = float(chain(iters, served.weights, *args))
        dt = (time.perf_counter() - t0) / iters
        best = min(best, dt)
        print(f"  {dt * 1e3:.2f} ms/batch  {b / dt:.1f} crops/s")
    print(f"[bench_export] best {best * 1e3:.2f} ms/batch  "
          f"{b / best:.1f} crops/s")


if __name__ == "__main__":
    main()
