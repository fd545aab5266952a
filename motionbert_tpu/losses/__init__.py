from motionbert_tpu.losses.pose import (
    loss_mpjpe,
    weighted_mpjpe,
    loss_2d_weighted,
    n_mpjpe,
    loss_velocity,
    loss_limb_var,
    loss_limb_gt,
    loss_angle,
    loss_angle_velocity,
    get_limb_lens,
    get_angles,
    pose3d_total_loss,
)
