from .quat import (
    axis_angle_to_quat,
    quat_conjugate,
    quat_multiply,
    quat_normalize,
    quat_rotate,
    quat_slerp,
    quat_to_axis_angle,
    quat_to_rotmat,
    random_quats,
    rotation_6d_to_matrix,
    rotmat_to_quat,
    yaw_to_quat,
)
from .se3 import SE3, matrix_to_se3, se3_interpolate, se3_to_matrix, transform_points
from .sh import eval_sh, num_sh_bases, rgb_to_sh0, sh0_to_rgb, sh_basis
from .camera import (
    Camera,
    camera_rays,
    downscale_camera,
    look_at,
    make_camera,
    pixel_centers,
)
