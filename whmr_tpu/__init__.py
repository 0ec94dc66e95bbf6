"""whmr_tpu — a TPU-native (JAX/XLA/Pallas/pjit) human-mesh-recovery framework.

Re-implements, TPU-first, the full capability surface of the W-HMR reference
(monocular human mesh recovery in world space with weak-supervised camera
calibration and orientation correction; see /root/reference README.md:11-14):

- SMPL body regression from person crops (PyMAF-style iterative mesh-alignment
  feedback), reference `models/whmr.py:308-678`.
- Focal-length (Tz) transformer head, camera-calibration network (pitch/roll/
  vfov), world-frame global-orientation regressor.
- IUV / depth auxiliary dense supervision heads and GT rasterization.
- Training runtime (multi-dataset mixture, multi-term loss, data-parallel over
  a `jax.sharding.Mesh`), evaluation (MPJPE / PA-MPJPE / PVE, AGORA export),
  and a demo inference pipeline.

Design stance (NOT a port): one functional, jittable graph per entry point;
static shapes; flax.linen modules; geometry as pure jnp ops; device meshes +
shard_map/pjit for scaling instead of DDP/NCCL.
"""

__version__ = "0.1.0"

from whmr_tpu.config import WHMRConfig, default_config  # noqa: F401
