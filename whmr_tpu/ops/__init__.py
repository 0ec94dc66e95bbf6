"""Pure-jnp numeric kernels (L0 of the framework).

Everything here is shape-static, batched, and differentiable — designed to
fuse into the surrounding XLA graph rather than to mirror the reference's
per-sample numpy/torch helpers.
"""

from whmr_tpu.ops.rotation import (  # noqa: F401
    batch_rodrigues,
    euler_to_rotmat,
    quat_to_rotmat,
    rot6d_to_rotmat,
    rotmat_to_angle_axis,
    rotmat_to_quat,
    rotmat_to_rot6d,
    unbiased_gram_schmidt,
)
from whmr_tpu.ops.camera import (  # noqa: F401
    convert_pare_to_full_img_cam,
    estimate_translation,
    perspective_projection,
    weak_perspective_projection,
)
from whmr_tpu.ops.grid_sample import grid_sample_2d  # noqa: F401
from whmr_tpu.ops.procrustes import (  # noqa: F401
    batch_compute_similarity_transform,
    mpjpe,
    pa_mpjpe,
    per_vertex_error,
)
