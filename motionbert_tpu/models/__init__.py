from motionbert_tpu.models.dstformer import DSTformer
from motionbert_tpu.models.factory import load_backbone
