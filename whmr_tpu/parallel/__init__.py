"""Device-mesh parallelism: mesh construction, sharding rules, collectives.

The TPU-native replacement for the reference's DDP/NCCL stack (SURVEY.md
§2.4): data parallelism rides a `jax.sharding.Mesh` 'data' axis (gradient
all-reduce inserted by XLA/GSPMD), SyncBatchNorm falls out for free because
batch reductions over a sharded axis are global, and tensor parallelism for
the larger ViT variants is expressed as Megatron-style parameter shardings
over a 'model' axis — a net-new capability the reference does not have.
"""

from whmr_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    make_mesh,
    replicated,
    shard_opt_state,
    shard_params,
)
