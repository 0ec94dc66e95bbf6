"""Inspect the collectives GSPMD inserts into the sharded train step.

VERDICT round-2 weak item 8: the multi-chip dryrun emitted a rendezvous
stall warning on the virtual mesh and nobody checked whether the dp x tp
layout produces a sane collective schedule. Single-chip hardware can't
MEASURE ICI, but the compiled HLO fully determines WHAT communicates:
this script jits the full train step over an 8-device CPU mesh
(dp=4 x tp=2, FSDP on) and prints every collective with its kind,
replica-group axis, and payload size — the artifact to review before any
real pod run.

Usage: python scripts/analyze_collectives.py [n_devices] [tp]
"""

import collections
import json
import os
import re
import sys


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    tp = int(sys.argv[2]) if len(sys.argv) > 2 else 2

    # Re-analyze a previously saved HLO dump without recompiling.
    load = os.environ.get("WHMR_LOAD_HLO")
    if load:
        with open(load) as f:
            analyze(f.read(), n, tp)
        return

    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={n}"
    ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from whmr_tpu.data.assets import synthetic_smpl_assets
    from whmr_tpu.models.regressor import body_consts_from_assets
    from whmr_tpu.models.whmr import WHMR
    from whmr_tpu.parallel import (
        batch_sharding,
        make_mesh,
        shard_opt_state,
        shard_params,
    )
    from whmr_tpu.training.train_step import (
        create_train_state,
        make_jitted_train_step,
    )
    from whmr_tpu.utils.testing import (
        make_example_inputs,
        make_example_train_batch,
        tiny_config,
    )

    mesh = make_mesh(n_devices=n, model_parallel=tp)
    dp = n // tp
    cfg = tiny_config()
    consts = body_consts_from_assets(synthetic_smpl_assets())
    model = WHMR(cfg)
    batch = dp * 2
    inputs = make_example_inputs(cfg, batch)
    args = {
        k: jnp.asarray(inputs[k])
        for k in ("x", "center", "scale", "bbox_height", "orig_shape", "bbox_info")
    }
    state = create_train_state(cfg, model, consts, jax.random.PRNGKey(0), args)
    state = state.replace(
        params=shard_params(state.params, mesh, fsdp=True, fsdp_min_size=1 << 10),
        batch_stats=shard_params(state.batch_stats, mesh),
    )
    state = state.replace(opt_state=shard_opt_state(state.opt_state, state.params, mesh))
    train_batch = {
        k: jax.device_put(jnp.asarray(v), batch_sharding(mesh))
        for k, v in make_example_train_batch(cfg, batch).items()
    }
    step_fn = make_jitted_train_step(cfg, model, mesh=mesh, donate=False)
    compiled = (
        step_fn.lower(state, consts, train_batch, jax.random.PRNGKey(1)).compile()
    )
    hlo = compiled.as_text()
    dump = os.environ.get("WHMR_SAVE_HLO")
    if dump:
        with open(dump, "w") as f:
            f.write(hlo)
    analyze(hlo, n, tp)


def analyze(hlo: str, n: int, tp: int):
    dp = n // tp

    # Parse collectives: op kind, element type/shape, replica groups.
    # The shape is a single token (f32[64,128]{1,0}) OR a parenthesized
    # TUPLE ((bf16[...], bf16[...])) — XLA's AllReduceCombiner merges
    # per-parameter gradient reductions into variadic collectives, and a
    # \S+ shape pattern would silently skip exactly those dominant ops.
    pat = re.compile(
        r"(\w[\w.\-]*) = (\([^)]*\)|\S+) (all-reduce|all-gather|"
        r"reduce-scatter|all-to-all|collective-permute)\(",
    )
    group_pat = re.compile(
        r"replica_groups=(\{\{.*?\}\}|\[[\d,]+\]<=\[[\d,]+\](?:T\([\d,]+\))?)"
    )
    dtype_bytes = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4,
                   "pred": 1, "f64": 8, "s64": 8}

    def payload(shape_str):
        # sums every array in the shape: one term for plain shapes, all
        # members for variadic (tuple) collectives
        total = 0
        for dt, dims in re.findall(r"(\w+)\[([\d,]*)\]", shape_str):
            elems = 1
            for d in dims.split(","):
                if d:
                    elems *= int(d)
            total += elems * dtype_bytes.get(dt, 4)
        return total

    # Axis classification from replica groups: the mesh is laid out
    # devices.reshape(dp, tp) — tp groups are consecutive ids {0,1},{2,3}...;
    # dp groups stride by tp: {0,2,4,6},{1,3,5,7}.
    def classify(groups_txt):
        # v2 iota form: [n_groups,group_size]<=[dims](T(perm))? — a group is a
        # row of iota(dims).transpose(perm).reshape(n_groups, group_size).
        m2 = re.match(r"\[(\d+),(\d+)\]<=\[([\d,]+)\](T\(([\d,]+)\))?", groups_txt)
        if m2:
            n_groups, group_size = int(m2.group(1)), int(m2.group(2))
            dims = [int(x) for x in m2.group(3).split(",")]
            perm = (
                [int(x) for x in m2.group(5).split(",")] if m2.group(5) else None
            )
            import numpy as _np

            ids = _np.arange(int(_np.prod(dims))).reshape(dims)
            if perm:
                ids = ids.transpose(perm)
            nums = ids.reshape(n_groups, group_size).tolist()
        else:
            nums = [
                [int(x) for x in re.findall(r"\d+", g)]
                for g in re.findall(r"\{([\d,\s]+)\}", groups_txt)
            ]
        if not nums:
            return "all"
        g0 = nums[0]
        # Axis patterns first: with a degenerate axis (tp=1 or dp=1) a
        # single-axis group spans all n devices and must NOT be labeled
        # both-axes.
        if tp > 1 and len(g0) == tp and all(b - a == 1 for a, b in zip(g0, g0[1:])):
            return "model(tp)"
        if dp > 1 and len(g0) == dp and all(b - a == tp for a, b in zip(g0, g0[1:])):
            return "data(dp)"
        if len(g0) == n:
            return "both-axes"
        return f"groups{len(g0)}"

    counts = collections.Counter()
    sizes = collections.Counter()
    details = []
    for line in hlo.splitlines():
        m = pat.search(line)
        if not m:
            continue
        _, shape_str, kind = m.groups()
        gm = group_pat.search(line)
        axis = classify(gm.group(1) if gm else "")
        size = payload(shape_str)
        counts[(kind, axis)] += 1
        sizes[(kind, axis)] += size
        details.append({"kind": kind, "axis": axis, "bytes": size,
                        "shape": shape_str})

    print(f"mesh: dp={dp} x tp={tp} over {n} devices; "
          f"{sum(counts.values())} collectives in the train step HLO")
    for (kind, axis), c in sorted(counts.items()):
        print(f"  {kind:20s} axis={axis:10s} count={c:4d} "
              f"total={sizes[(kind, axis)] / 1e6:8.2f} MB")
    big = sorted(details, key=lambda d: -d["bytes"])[:10]
    print("largest payloads:")
    for d in big:
        print(f"  {d['kind']:18s} {d['axis']:10s} {d['bytes']/1e6:8.3f} MB  {d['shape']}")

    out = {
        "mesh": {"dp": dp, "tp": tp},
        "counts": {f"{k}/{a}": c for (k, a), c in counts.items()},
        "bytes": {f"{k}/{a}": s for (k, a), s in sizes.items()},
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
