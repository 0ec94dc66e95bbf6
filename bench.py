"""Headline benchmark: W-HMR inference throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": "person_crops_per_sec_per_chip", "value": N, "unit": "crops/s",
   "vs_baseline": N / 1000}

Baseline: the rebuild north star from BASELINE.md — >= 1000 person-crops/sec/
chip on TPU v5e for the full WHMR forward (ViT-B backbone, 3 MAF steps,
Tz head, global-orient head, 4 SMPL forwards per crop). The PyTorch
reference measures the same quantity as demo "W-HMR FPS" (whmr_demo.py:81-88)
but stores no number.

Methodology notes for this host: the axon TPU tunnel executes asynchronously
and `block_until_ready` does not synchronize, so K forwards are chained
*inside* one jit (data dependency through the loop carry) and a scalar is
read back — wall time / K is a faithful per-forward latency that amortizes
the tunnel round trip. Params/consts are passed as jit arguments (closing
over them embeds 450 MB of constants and overflows the remote-compile
request).
"""

import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np


def wait_for_tpu(deadline_s: float = 900.0, probe_timeout_s: float = 150.0) -> None:
    """Block until the axon TPU backend answers, or the deadline passes.

    The pool occasionally drops a client mid-claim (e.g. a benchmark killed
    by a timeout) and new clients then fail/hang with UNAVAILABLE until the
    stale grant expires. jax caches backend-init failures per process, so
    the probe runs in SUBPROCESSES; this process touches jax only after a
    probe succeeds. No-op when the platform isn't axon (CPU test runs)."""
    plats = os.environ.get("JAX_PLATFORMS", "")
    jmod = sys.modules.get("jax")
    if jmod is not None:
        # an in-process override (jax.config.update("jax_platforms", "cpu"),
        # the tests' pattern) beats the env var — don't probe a backend the
        # caller isn't going to use
        try:
            plats = str(jmod.config.jax_platforms or plats)
        except Exception:
            pass
    if plats.split(",")[0].strip() != "axon":
        return
    try:
        # this process already holds a live AXON client (e.g. the driver
        # re-enters entry() after a compile-check): probe subprocesses would
        # queue behind OUR OWN grant ("one TPU client at a time") and burn
        # the whole deadline against a healthy pool — skip probing entirely.
        # An initialized CPU backend must NOT skip: it holds no pool grant.
        if jmod is not None and "axon" in jmod._src.xla_bridge._backends:
            return
    except Exception:
        pass
    deadline_s = float(os.environ.get("WHMR_BENCH_TPU_WAIT", deadline_s))
    # The child tries to time ITSELF out (SIGALRM -> exception -> clean
    # interpreter exit, releasing any in-flight claim). Caveat: if backend
    # init blocks inside a C call, CPython can't run the handler — the
    # parent then escalates SIGTERM -> (10 s) -> SIGKILL as a best effort;
    # only the SIGKILL tail risks stranding a fresh grant.
    code = (
        "import signal\n"
        "def _to(*_):\n"
        "    raise TimeoutError\n"
        "signal.signal(signal.SIGALRM, _to)\n"
        f"signal.alarm({max(int(probe_timeout_s) - 20, 10)})\n"
        "try:\n"
        "    import jax\n"
        "    jax.devices()\n"
        "    print('TPU_OK')\n"
        "except TimeoutError:\n"
        "    print('TPU_PROBE_TIMEOUT')\n"
    )
    t0 = time.monotonic()
    attempt = 0
    while True:
        attempt += 1
        proc = subprocess.Popen(
            [sys.executable, "-c", code],
            stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
        )
        try:
            out, _ = proc.communicate(timeout=probe_timeout_s)
        except subprocess.TimeoutExpired:
            out = ""
            proc.terminate()  # graceful first; see comment above
            try:
                proc.wait(timeout=10)
            except subprocess.TimeoutExpired:
                proc.kill()
                proc.wait()
        if "TPU_OK" in out:
            if attempt > 1:
                print(f"[bench] TPU reachable after {attempt} probes "
                      f"({time.monotonic() - t0:.0f}s)", file=sys.stderr)
            return
        remaining = deadline_s - (time.monotonic() - t0)
        if remaining <= 0:
            print("[bench] WARNING: TPU probe never succeeded within "
                  f"{deadline_s:.0f}s; proceeding anyway", file=sys.stderr)
            return
        print(f"[bench] TPU unavailable (probe {attempt}); retrying, "
              f"{remaining:.0f}s left", file=sys.stderr)
        time.sleep(min(45.0, remaining))


def main():
    ap = argparse.ArgumentParser()
    # Batch sweep on v5e (crops/s): 32->1873, 48->2123, 64->2003, 96->1859,
    # 128->1866. 48 wins (9216 tokens = clean MXU tiling for the ViT).
    ap.add_argument("batch", nargs="?", type=int, default=48)
    ap.add_argument(
        "--camcalib", action="store_true",
        help="include the CamCalib ResNet on a 600px full frame (the demo "
             "graph the reference times, whmr.py:509-522 / tester.py:100-104; "
             "one frame per batch, rotation broadcast to all crops)",
    )
    ap.add_argument(
        "--profile", default=None, metavar="DIR",
        help="capture a jax.profiler (Perfetto/XPlane) trace of one timed "
             "rep into DIR (SURVEY §5 tracing; view with TensorBoard's "
             "profile plugin or ui.perfetto.dev)",
    )
    ap.add_argument(
        "--cfg_file", default=None,
        help="reference-style YAML config (e.g. configs/vit-l.yaml to "
             "bench the ViT-L/H presets; default = the headline ViT-B "
             "graph)",
    )
    ap.add_argument(
        "--attn", default=None, metavar="IMPL",
        help="opt-in attention formulation override (vit.attn_impl), e.g. "
             "bf16sm — the compute-dtype softmax that wins ~3.5%% on the "
             "forward tower (scripts/bench_attn.py sweep) at the cost of "
             "changed bf16 numerics; default keeps the fp32-softmax graph "
             "the parity tests cover",
    )
    opts = ap.parse_args()

    wait_for_tpu()

    from whmr_tpu.utils.profiling import enable_compile_cache

    enable_compile_cache()
    import jax
    import jax.numpy as jnp
    from jax import lax

    from whmr_tpu.config import WHMRConfig
    from whmr_tpu.data.assets import synthetic_smpl_assets
    from whmr_tpu.models.regressor import body_consts_from_assets
    from whmr_tpu.models.whmr import WHMR
    from whmr_tpu.utils.testing import make_example_inputs

    batch = opts.batch
    iters = 10

    if opts.cfg_file:
        from whmr_tpu.config import load_yaml

        cfg = load_yaml(opts.cfg_file)
    else:
        cfg = WHMRConfig()
    if opts.attn:
        cfg = cfg.with_overrides(**{"vit.attn_impl": opts.attn})
    consts = body_consts_from_assets(synthetic_smpl_assets())
    model = WHMR(cfg, dtype=jnp.bfloat16)
    inp = make_example_inputs(cfg, batch)
    args = {k: jnp.asarray(v) for k, v in inp.items()}
    if opts.camcalib:
        ch, cw = cfg.cam_img_size
        args["full_x"] = jnp.asarray(
            np.random.RandomState(1).randn(1, ch, cw, 3).astype(np.float32)
        )

    # Complete param tree (CLAUDE.md invariant): init includes a small
    # full_x so the CamCalib branch exists (input-size independent).
    init_args = dict(args)
    init_args["full_x"] = jnp.zeros((batch, 64, 64, 3), jnp.float32)
    variables = jax.jit(
        lambda c, a: model.init({"params": jax.random.PRNGKey(0)}, c, **a)
    )(consts, init_args)

    def fwd(v, c, a):
        # Consume BOTH the camera-frame and the world-frame outputs: the
        # global-orient head + world SMPL forward feed only global_output,
        # and returning just smpl_out would let XLA dead-code-eliminate
        # them — the benchmark must measure the graph it claims to.
        out = model.apply(v, c, **a)
        return (
            out["smpl_out"][-1]["verts"],
            out["global_output"]["global_verts"],
        )

    @jax.jit
    def chained(v, c, a):
        def body(i, carry):
            aa = dict(a)
            aa["x"] = a["x"] + (carry * 0).astype(a["x"].dtype)
            if "full_x" in a:
                # Make CamCalib loop-carried too, or XLA hoists the whole
                # ResNet out of the fori_loop as loop-invariant and the
                # bench measures it once instead of per forward.
                aa["full_x"] = a["full_x"] + (carry * 0).astype(a["full_x"].dtype)
            verts, gverts = fwd(v, c, aa)
            return carry + jnp.sum(verts.astype(jnp.float32)) + jnp.sum(
                gverts.astype(jnp.float32)
            )

        return lax.fori_loop(0, iters, body, jnp.float32(0))

    # compile + warm up
    float(chained(variables, consts, args))
    if opts.profile:
        from whmr_tpu.utils.profiling import trace

        with trace(opts.profile):
            float(chained(variables, consts, args))
        print(f"[bench] trace written to {opts.profile}", file=sys.stderr)
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        float(chained(variables, consts, args))
    dt = (time.perf_counter() - t0) / (reps * iters)
    crops_per_sec = batch / dt

    metric = "person_crops_per_sec_per_chip"
    if opts.camcalib:
        metric += "_camcalib"
    if opts.attn:
        metric += f"_attn_{opts.attn}"
    if opts.cfg_file:
        # a ViT-L/H preset prints a much lower (correct) number — without a
        # suffix it would be indistinguishable from a ViT-B headline
        # regression to anything collecting these JSON lines
        stem = os.path.splitext(os.path.basename(opts.cfg_file))[0]
        metric += f"_{stem.replace('-', '_')}"
    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(crops_per_sec, 1),
                "unit": "crops/s",
                "vs_baseline": round(crops_per_sec / 1000.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
