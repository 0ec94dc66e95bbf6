"""Mesh construction and sharding rules for WHMR training/inference.

Strategy (SURVEY.md §2.4 'TPU-native equivalents'):
- Primary axis 'data': batch sharding — the counterpart of the reference's
  one-process-per-GPU DDP (train.py:26-28, trainer.py:84-91). Gradients
  all-reduce over ICI automatically (GSPMD inserts psum when the loss reduces
  a 'data'-sharded batch against replicated params).
- Secondary axis 'model': Megatron-style tensor parallelism for transformer
  blocks (qkv/fc1 column-split, proj/fc2 row-split). The reference has no TP
  (largest layer is ViT-B); this is the documented net-new capability for
  ViT-L/H variants.

BatchNorm note: under jit/GSPMD a mean over the sharded batch axis IS a
global mean, so cross-replica (sync) BN semantics hold by construction — no
SyncBatchNorm conversion step (trainer.py:83) is needed.
"""

from __future__ import annotations

import re
from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None,
    model_parallel: int = 1,
    axis_names: Tuple[str, str] = ("data", "model"),
) -> Mesh:
    """Build a (data, model) mesh over the available devices.

    Lays the 'model' axis over adjacent devices so TP collectives ride the
    fastest ICI hops and DP all-reduces span the remaining dimension.
    """
    devices = jax.devices()
    n = n_devices or len(devices)
    assert n % model_parallel == 0, (n, model_parallel)
    grid = np.asarray(devices[:n]).reshape(n // model_parallel, model_parallel)
    return Mesh(grid, axis_names)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis batch sharding over 'data' (replicated over 'model')."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


# Megatron-style TP rules, matched against the flattened param path.
# (path_regex, partition spec builder by array rank)
_TP_RULES = [
    # attention qkv: column parallel (split heads) — kernel (d, 3d), bias (3d,)
    (re.compile(r".*attn/qkv/kernel$"), lambda r: P(None, "model")),
    (re.compile(r".*attn/qkv/bias$"), lambda r: P("model")),
    # attention out-proj: row parallel — kernel (d, d) split on input
    (re.compile(r".*attn/proj/kernel$"), lambda r: P("model", None)),
    # MLP fc1 column / fc2 row (flax auto-names Dense_0/Dense_1 inside MLP)
    (re.compile(r".*mlp/Dense_0/kernel$"), lambda r: P(None, "model")),
    (re.compile(r".*mlp/Dense_0/bias$"), lambda r: P("model")),
    (re.compile(r".*mlp/Dense_1/kernel$"), lambda r: P("model", None)),
]


def _fsdp_spec(shape, data_size: int, base: P, min_size: int) -> P:
    """ZeRO-3-style spec: shard the largest still-free dim over 'data'.

    Applied on top of a TP spec (`base`): dims already split over 'model'
    stay split; the largest unsharded dim that divides the data-axis size
    takes 'data'. Small tensors (biases, norms, < min_size elements) stay
    replicated — gathering them per-layer costs more than storing them.
    """
    if int(np.prod(shape)) < min_size or data_size <= 1:
        return base
    taken = list(base) + [None] * (len(shape) - len(base))
    order = sorted(range(len(shape)), key=lambda d: -shape[d])
    for d in order:
        if taken[d] is None and shape[d] % data_size == 0:
            taken[d] = "data"
            return P(*taken)
    return base


def _spec_for(path: str, ndim: int, use_tp: bool) -> P:
    if use_tp:
        for rx, builder in _TP_RULES:
            if rx.match(path):
                return builder(ndim)
    return P()


def shard_params(
    params,
    mesh: Mesh,
    use_tp: Optional[bool] = None,
    fsdp: bool = False,
    fsdp_min_size: int = 1 << 16,
):
    """Apply sharding rules to a param/variable pytree.

    With use_tp (default: mesh has a >1 'model' axis), transformer block
    weights split over 'model'; everything else is replicated. With `fsdp`,
    remaining large tensors additionally shard over 'data' (ZeRO-3
    equivalent — net-new vs the reference, which only has DDP): GSPMD
    inserts the per-layer all-gather in fwd/bwd and the gradient
    reduce-scatter, so optimizer state and master params are distributed.
    """
    if use_tp is None:
        use_tp = mesh.shape.get("model", 1) > 1
    data_size = mesh.shape.get("data", 1)

    def path_str(kp):
        return "/".join(
            getattr(k, "key", getattr(k, "name", str(k))) for k in kp
        )

    def place(kp, leaf):
        ndim = getattr(leaf, "ndim", 0)
        spec = _spec_for(path_str(kp), ndim, use_tp)
        if fsdp:
            spec = _fsdp_spec(getattr(leaf, "shape", ()), data_size, spec,
                              fsdp_min_size)
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)


def shard_opt_state(opt_state, params, mesh: Mesh):
    """Place optimizer state on the mesh, mirroring the param shardings.

    Optax states (e.g. adam's mu/nu) are pytrees with the params' structure;
    those subtrees take each param's sharding (so FSDP/TP-sharded params get
    matching sharded moments — the ZeRO optimizer-state distribution).
    Everything else (step counts, scalars) is replicated. Without this, a
    plain `jit(tx.init)` commits scalars to one device, which conflicts with
    mesh-committed state in the jitted train step.
    """
    rep = NamedSharding(mesh, P())
    pdef = jax.tree_util.tree_structure(params)

    def like_params(node):
        return jax.tree_util.tree_map(
            lambda t, x: jax.device_put(x, t.sharding)
            if hasattr(t, "sharding") else x,
            params, node,
        )

    def rec(node):
        try:
            if jax.tree_util.tree_structure(node) == pdef:
                return like_params(node)
        except Exception:
            pass
        if hasattr(node, "_fields"):  # NamedTuple optax states
            return type(node)(*(rec(c) for c in node))
        if isinstance(node, (tuple, list)):
            return type(node)(rec(c) for c in node)
        if isinstance(node, dict):
            return {k: rec(v) for k, v in node.items()}
        if hasattr(node, "shape"):
            return jax.device_put(node, rep)
        return node

    return rec(opt_state)


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Multi-host initialization over DCN (SURVEY §2.4: replaces the
    reference's tcp:// NCCL rendezvous, train.py:26-28).

    On TPU pods the arguments are auto-detected from the environment; pass
    them explicitly for CPU/GPU multi-process runs. After this, jax.devices()
    spans all hosts and the data-parallel loader shards by
    jax.process_index() (data/loader.py).
    """
    import jax

    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    jax.distributed.initialize(**kwargs)
