"""Load-benchmark the whmr-serve daemon: concurrent HTTP clients, real
wire protocol, coalescing on.

Usage:
  python scripts/bench_serve.py [--clients N] [--seconds S] [--people K]
                                [--max_people B] [--bundle DIR]
                                [--checkpoint DIR] [--data_parallel N]
                                [--tiny]

Starts the daemon IN-PROCESS on an ephemeral port (the axon pool allows
one TPU client process, so daemon and clients share this process), then
hammers `POST /infer` from N client threads for S seconds, each request
carrying an npz with a random image + K client-side bboxes (detector
skipped — this measures the serving stack: HTTP, decode, crop prep,
cross-request coalescing, device forward, npz response).

Prints ONE JSON line: requests/s, person-crops/s, latency percentiles,
and the coalescing ratio (device batches per request — lower is better).
Weights are random unless --bundle/--checkpoint is given; throughput is
weight-independent.

Reference counterpart: none — the reference's only deployment story is
the in-process demo loop (demo/whmr_demo.py:38-91); this measures the
net-new serving surface end to end.
"""

import argparse
import io
import json
import sys
import threading
import time
import urllib.request


def build_parser():
    p = argparse.ArgumentParser()
    p.add_argument("--clients", type=int, default=8)
    p.add_argument("--seconds", type=float, default=20.0)
    p.add_argument("--people", type=int, default=2,
                   help="bboxes per request")
    p.add_argument("--max_people", type=int, default=8,
                   help="device batch capacity (coalescing target)")
    p.add_argument("--bundle", default=None)
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--data_parallel", type=int, default=0)
    p.add_argument("--tensor_parallel", type=int, default=0)
    p.add_argument("--no_coalesce", action="store_true")
    p.add_argument("--camcalib", action="store_true",
                   help="enable CamCalib (live-checkpoint mode): each "
                        "request's frame runs the per-frame calibration "
                        "graph once (content-hash cached) and its crops "
                        "coalesce with per-crop cam_rotmat — load-tests "
                        "the round-4 camcalib-coalescing path")
    p.add_argument("--fields", default=None,
                   help="comma list: project /infer responses to these "
                        "output keys (e.g. pred_cam_t,global_pose — the "
                        "full payload is verts-dominated, ~160 KB/person)")
    p.add_argument("--unique_frames", type=int, default=0,
                   help="cycle this many distinct request images (0 = one "
                        "shared image; with --camcalib, sizes the cam "
                        "cache hit rate)")
    p.add_argument("--tiny", action="store_true",
                   help="tiny model config (CPU smoke runs)")
    p.add_argument("--dtype", default=None, choices=["fp32", "bf16"],
                   help="live-model compute dtype (default bf16, the "
                        "headline bench's setting; bundles fix theirs at "
                        "export, so the flag is live-mode only)")
    p.add_argument("--cfg_file", default=None)
    p.add_argument("--misc", nargs="*", default=[])
    p.add_argument("--data_dir", default=None)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)

    if args.tiny:
        # CPU smoke MUST NOT dial the axon pool: a second client queues —
        # or worse, steals the grant between a sibling's processes and
        # kills its next device call (observed: FailedPrecondition on a
        # concurrent eval). In-process override per CLAUDE.md.
        import jax

        jax.config.update("jax_platforms", "cpu")

    from whmr_tpu.utils.profiling import enable_compile_cache

    enable_compile_cache()
    import numpy as np

    from whmr_tpu.inference.pipeline import DemoPipeline
    from whmr_tpu.inference.serve_cli import BatchingExecutor, WHMRServer

    # -- build the pipeline (random init unless weights are given) -------
    if args.tiny:
        # CPU smoke path: tiny dims, synthetic assets, fp32
        import jax
        import jax.numpy as jnp

        from whmr_tpu.data.assets import synthetic_smpl_assets
        from whmr_tpu.inference.demo_cli import serving_mesh
        from whmr_tpu.models.regressor import body_consts_from_assets
        from whmr_tpu.models.whmr import WHMR
        from whmr_tpu.training.train_step import create_train_state
        from whmr_tpu.utils.testing import make_example_inputs, tiny_config

        cfg = tiny_config()
        assets = synthetic_smpl_assets()
        consts = body_consts_from_assets(assets)
        model = WHMR(cfg)
        inputs = make_example_inputs(cfg, 2)
        state = create_train_state(
            cfg, model, consts, jax.random.PRNGKey(0),
            {k: jnp.asarray(v) for k, v in inputs.items()},
        )
        pipe = DemoPipeline(
            cfg, {"params": state.params, "batch_stats": state.batch_stats},
            assets, max_people=args.max_people, use_camcalib=args.camcalib,
            mesh=serving_mesh(args),
        )
    else:
        # the CLIs' canonical path (demo_cli.build_pipeline): same restore
        # template, same mesh/dtype/bundle handling and guards
        from argparse import Namespace

        from whmr_tpu.inference.demo_cli import build_pipeline

        if args.camcalib and args.bundle:
            # split bundles carry a per-frame CamCalib graph and coalesce
            # exactly like the live model; batch-mode bundles trace the
            # frame into the batch-global graph and cannot
            import os

            meta = json.load(
                open(os.path.join(args.bundle, "meta.json"))
            )
            mode = meta.get("camcalib_mode") or (
                "batch" if meta.get("camcalib") else ""
            )
            if mode != "split":
                raise SystemExit(
                    "--camcalib load-testing needs --checkpoint (live "
                    "model) or a `whmr-export --camcalib split` bundle: "
                    f"this bundle's camcalib_mode is {mode or 'off'!r}"
                )
        pipe = build_pipeline(Namespace(
            misc=args.misc, cfg_file=args.cfg_file, data_dir=args.data_dir,
            checkpoint=args.checkpoint, bundle=args.bundle,
            max_people=args.max_people, no_camcalib=not args.camcalib,
            data_parallel=args.data_parallel,
            tensor_parallel=args.tensor_parallel,
            # bf16 for the live model (the headline bench's setting);
            # bundles fixed their dtype at export, so pass the neutral
            # fp32 there or build_pipeline's guard would reject the run
            dtype=args.dtype or ("fp32" if args.bundle else "bf16"),
        ))

    executor = None
    if not args.no_coalesce:
        executor = BatchingExecutor(pipe, max_wait_ms=2.0)

    # compile BEFORE any socket exists: cold bundle/model compiles through
    # the tunnel can exceed any sane HTTP timeout (observed >600 s for a
    # split bundle's two graphs), and a timed-out warmup request kills the
    # run while the server is mid-compile
    from whmr_tpu.inference.pipeline import Detection

    _wimg = np.zeros((480, 640, 3), np.uint8)
    _wdet = [Detection(320.0, 240.0, 180.0)]
    if executor is not None:
        # explicit long timeout: submit's 600 s default is not enough for
        # a cold fp32-bundle compile through the tunnel (observed >600 s)
        executor.submit(_wimg, dets=_wdet, timeout=1800.0)
    else:
        pipe.run_image(_wimg, dets=_wdet)
    print("[bench_serve] in-process compile warmup done",
          file=sys.stderr, flush=True)

    server = WHMRServer(pipe, {"bench": True}, executor=executor)
    httpd = server.bind("127.0.0.1", 0)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()

    # -- request body: npz with image + client bboxes --------------------
    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (480, 640, 3), np.uint8)
    # the executor truncates per-request dets to capacity — count what the
    # server actually computes, not what the client asked for
    k = min(args.people, args.max_people)
    boxes = np.stack([
        rng.uniform(120, 520, args.people), rng.uniform(120, 360, args.people),
        rng.uniform(120, 240, args.people),
    ], axis=-1).astype(np.float32)

    def make_body(image):
        buf = io.BytesIO()
        np.savez(buf, image=image, bboxes=boxes)
        return buf.getvalue()

    # --unique_frames N: cycle N distinct images so per-frame work
    # (CamCalib calls, cache behavior) is exercised realistically
    n_imgs = max(args.unique_frames, 1)
    bodies = [make_body(img)] + [
        make_body(rng.randint(0, 255, (480, 640, 3), np.uint8))
        for _ in range(n_imgs - 1)
    ]
    url = f"http://127.0.0.1:{port}/infer"
    if args.fields:
        url += f"?fields={args.fields}"
    req_counter = [0]

    def post():
        with lat_lock:
            req_counter[0] += 1
            body = bodies[req_counter[0] % len(bodies)]
        req = urllib.request.Request(url, data=body, method="POST")
        with urllib.request.urlopen(req, timeout=600) as r:
            return r.read()

    latencies = []
    lat_lock = threading.Lock()

    for b in bodies:  # warmup: compile + fill the cam cache before timing
        for attempt in range(4):
            try:
                urllib.request.urlopen(
                    urllib.request.Request(url, data=b, method="POST"),
                    timeout=600,
                ).read()
                break
            except urllib.error.HTTPError as e:
                # transient TPU-grant handover right after another client
                # exits surfaces as a 500 for a few seconds — show the
                # server's error body and retry
                detail = e.read().decode(errors="replace")[:300]
                print(f"[bench_serve] warmup attempt {attempt}: "
                      f"HTTP {e.code} {detail}", file=sys.stderr, flush=True)
                if attempt == 3:
                    raise
                time.sleep(5.0 * (attempt + 1))
    if executor is not None:
        # report coalescing/camcalib ratios for the timed window only
        for key in executor.stats:
            executor.stats[key] = 0
    print(f"[bench_serve] warm, starting {args.clients} clients x "
          f"{args.seconds:.0f}s (people/request={k}, "
          f"capacity={args.max_people})", file=sys.stderr, flush=True)

    stop_at = time.perf_counter() + args.seconds
    errors = [0]

    def client():
        local = []
        while time.perf_counter() < stop_at:
            t0 = time.perf_counter()
            try:
                post()
            except Exception:
                with lat_lock:
                    errors[0] += 1
                continue
            local.append(time.perf_counter() - t0)
        with lat_lock:
            latencies.extend(local)

    threads = [threading.Thread(target=client) for _ in range(args.clients)]
    t0 = time.perf_counter()
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    wall = time.perf_counter() - t0

    httpd.shutdown()
    httpd.server_close()
    if executor is not None:
        executor.shutdown()

    lat = np.sort(np.asarray(latencies))
    n = len(lat)
    stats = dict(executor.stats) if executor is not None else {}
    out = {
        "metric": "serve_crops_per_sec",
        "value": round(n * k / wall, 1),
        "unit": "crops/s",
        "requests_per_sec": round(n / wall, 1),
        "clients": args.clients,
        "people_per_request": k,
        "latency_ms": {
            "p50": round(float(lat[n // 2]) * 1e3, 1),
            "p95": round(float(lat[int(n * 0.95)]) * 1e3, 1),
            "p99": round(float(lat[min(int(n * 0.99), n - 1)]) * 1e3, 1),
        } if n else None,
        "errors": errors[0],
        "device_batches_per_request": round(
            stats["device_batches"] / max(stats["requests"], 1), 3
        ) if stats else None,
    }
    if stats.get("camcalib_calls") or stats.get("camcalib_cache_hits"):
        out["camcalib_calls"] = stats["camcalib_calls"]
        out["camcalib_cache_hit_rate"] = round(
            stats["camcalib_cache_hits"]
            / max(stats["camcalib_calls"] + stats["camcalib_cache_hits"], 1),
            3,
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
