from topo4d_tpu.losses.image import (
    l1_loss,
    l1_loss_sum_last,
    l2_loss,
    weighted_l2_loss_v1,
    weighted_l2_loss_v2,
    ssim,
    psnr,
    mse,
)
from topo4d_tpu.losses.temporal import TemporalPriors, rigid_rot_iso_losses
from topo4d_tpu.losses.flatten import (
    DihedralQuadruples,
    build_dihedral_quadruples,
    flatten_loss,
    soft_flatten_loss,
    UmbrellaFlatten,
    build_umbrella_flatten,
    umbrella_flatten_loss,
)
