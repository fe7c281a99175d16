from .se3 import (
    quat_to_rot,
    rot_to_quat,
    camera_from_tensor,
    tensor_from_camera,
    to_homogeneous,
    inv_T,
    pose_rt,
)
from .rays import (
    ray_dirs_from_uv,
    rays_from_uv,
    get_rays,
    sample_uv_uniform,
    sample_uv_valid,
    gather_pixels,
)
from .compositing import raw2outputs
from .sampling import (
    sample_pdf,
    stratified_zvals,
    surface_zvals,
    ray_far_bound,
)
from .coords import normalize_3d_coordinate, intrinsics_matrix
