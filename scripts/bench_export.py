"""Serving throughput of an exported AOT bundle (whmr-export output).

Usage: python scripts/bench_export.py BUNDLE_DIR [ITERS] [LOOPS]

Measures steady-state crops/s through the deserialized graph — the number
a serving deployment of the artifact sees, directly comparable to
bench.py's live-model headline (same methodology: ITERS chained calls
inside ONE jit to amortize the axon tunnel RTT, synced on a dependent
scalar readback; `exp.call` is traceable, so the chain jits like any fn).
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

    served = load_exported(bundle)
    b = served.batch_size or 48  # polymorphic bundle: bench at the optimum
    h, w = served.meta["crop_hw"]
    rng = np.random.RandomState(0)
    img_h, img_w = 720.0, 1280.0
    bbox_height = rng.uniform(150, 500, b).astype(np.float32)
    center = np.stack(
        [rng.uniform(200, 1080, b), rng.uniform(150, 570, b)], -1
    ).astype(np.float32)
    focal = np.float32(np.sqrt(img_h**2 + img_w**2))
    bbox_info = (np.stack(
        [center[:, 0] - img_w / 2, center[:, 1] - img_h / 2, bbox_height,
         np.full(b, img_w), np.full(b, img_h)], -1,
    ) / focal).astype(np.float32)
    args = [
        jnp.asarray(rng.randint(0, 255, (b, h, w, 3), np.uint8)),
        jnp.asarray(center),
        jnp.asarray(bbox_height / 200.0),
        jnp.asarray(bbox_height),
        jnp.asarray(np.tile([img_h, img_w], (b, 1)).astype(np.float32)),
        jnp.asarray(bbox_info),
    ]
    if served.camcalib:
        ch, cw = served.meta["cam_img_size"]
        args.append(jnp.asarray(rng.randint(0, 255, (1, ch, cw, 3), np.uint8)))

    @partial(jax.jit, static_argnums=0)
    def chain(n, weights, *a):
        def body(_i, carry):
            aa = list(a)
            # fold the carry into one fp input so iterations can't be CSE'd
            aa[1] = aa[1] + (carry * 0).astype(aa[1].dtype)
            out = served.exported.call(weights, *aa)
            return out["focal_length"].sum()

        return lax.fori_loop(0, n, body, jnp.float32(0.0))

    _ = float(chain(1, served.weights, *args))  # warmup/compile
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
