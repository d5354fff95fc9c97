from topo4d_tpu.core.quaternion import (
    quat_normalize,
    quat_to_rotmat,
    quat_mult,
    quat_conjugate,
    normal_to_quat,
    normal_to_quat_reference,
)
from topo4d_tpu.core.camera import Camera, make_camera, full_projection_matrix
from topo4d_tpu.core.gaussian import (
    GaussianRenderVars,
    activate_params,
    build_cov3d,
    project_gaussians,
)
