"""Worker process for the multi-host test (tests/test_multihost.py).

Run as: python tests/_multihost_worker.py <process_id> <coordinator_port> <out_json>

Exercises the REAL multi-host stack (VERDICT round-2 item 3; reference
counterpart: train.py:26-28 NCCL TCP rendezvous + DistributedSampler):
`parallel.mesh.init_distributed` over two CPU processes (4 virtual devices
each), the per-host disjoint BatchLoader striding, and one full jitted
train step on the global dp4 x tp2 mesh.
"""

import json
import os
import sys


def main() -> None:
    pid = int(sys.argv[1])
    port = int(sys.argv[2])
    out_path = sys.argv[3]

    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    os.environ.pop("JAX_COMPILATION_CACHE_DIR", None)
    import jax

    jax.config.update("jax_platforms", "cpu")
    # NO persistent compile cache here: if one process hits a cache entry the
    # other is still compiling, the early process reaches its first Gloo
    # collective alone and the 30s Gloo context-connect timeout kills the
    # run. Compiling in lockstep keeps the skew well under the timeout.
    jax.config.update("jax_compilation_cache_dir", None)

    from whmr_tpu.parallel.mesh import init_distributed

    init_distributed(
        coordinator_address=f"localhost:{port}", num_processes=2, process_id=pid
    )
    assert jax.process_count() == 2, jax.process_count()
    assert jax.process_index() == pid
    assert len(jax.devices()) == 8, len(jax.devices())
    assert len(jax.local_devices()) == 4

    import jax.numpy as jnp
    import numpy as np

    # Establish the Gloo contexts with a TINY collective before the heavy
    # train-step compile: Gloo context init waits at most ~30 s for the
    # peer's KV entry, and under external CPU load the two processes'
    # multi-minute compiles can skew past that (observed: one compile took
    # 2m30s while the peer's context init timed out). The tiny program
    # compiles in seconds on both sides, so the rendezvous happens with
    # negligible skew; the contexts are then reused by later executables.
    from jax.sharding import NamedSharding, PartitionSpec as P
    from whmr_tpu.parallel import make_mesh

    warm_mesh = make_mesh(n_devices=8, model_parallel=2)
    warm = jax.jit(
        lambda x: jnp.sum(x * 2.0),
        in_shardings=NamedSharding(warm_mesh, P("data")),
    )(jax.device_put(
        jnp.arange(8.0),
        NamedSharding(warm_mesh, P("data")),
    ))
    assert float(warm) == 56.0, float(warm)

    # ---- per-host disjoint data sharding (DistributedSampler equivalent) --
    from whmr_tpu.data.loader import BatchLoader

    class IndexDataset:
        def __len__(self):
            return 64

        def __getitem__(self, i):
            return {"idx": np.asarray(i, np.int64)}

    loader = BatchLoader(
        IndexDataset(), batch_size=4, shuffle=True, num_workers=2,
        num_hosts=jax.process_count(), host_index=jax.process_index(), seed=7,
    )
    loader.set_epoch(0)
    seen = [int(i) for batch in loader for i in batch["idx"]]

    # ---- one full train step over the global dp4 x tp2 mesh ---------------
    from whmr_tpu.data.assets import synthetic_smpl_assets
    from whmr_tpu.models.regressor import body_consts_from_assets
    from whmr_tpu.models.whmr import WHMR
    from whmr_tpu.parallel import batch_sharding, make_mesh, shard_opt_state, shard_params
    from whmr_tpu.training.train_step import create_train_state, make_jitted_train_step
    from whmr_tpu.utils.testing import (
        make_example_inputs,
        make_example_train_batch,
        tiny_config,
    )

    mesh = make_mesh(n_devices=8, model_parallel=2)
    cfg = tiny_config()
    consts = body_consts_from_assets(synthetic_smpl_assets())
    model = WHMR(cfg)
    batch = 8
    inputs = make_example_inputs(cfg, batch)
    args = {
        k: jnp.asarray(inputs[k])
        for k in ("x", "center", "scale", "bbox_height", "orig_shape", "bbox_info")
    }
    # Identical on every process (same seed) -> valid global device_put.
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
    new_state, metrics = step_fn(state, consts, train_batch, jax.random.PRNGKey(1))
    loss = float(metrics["loss"])
    assert np.isfinite(loss), loss
    assert int(new_state.step) == 1

    with open(out_path, "w") as f:
        json.dump({"pid": pid, "indices": seen, "loss": loss}, f)
    print(f"MULTIHOST OK pid={pid} loss={loss:.6f}", flush=True)


if __name__ == "__main__":
    main()
