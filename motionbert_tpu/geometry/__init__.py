from motionbert_tpu.geometry.skeleton import (
    H36M_LEFT_JOINTS,
    H36M_RIGHT_JOINTS,
    H36M_LIMBS,
    H36M_ANGLE_PAIRS,
    flip_data,
    flip_data_jnp,
    coco2h36m,
    halpe2h36m,
    posetrack2h36m,
)
from motionbert_tpu.geometry.transforms import (
    crop_scale,
    crop_scale_3d,
    resample,
    split_clips,
    make_cam,
)
from motionbert_tpu.geometry.procrustes import mpjpe, p_mpjpe, rigid_align
