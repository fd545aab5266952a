from motionbert_tpu.core.config import ConfigDict, get_config, read_pkl, ensure_dir
from motionbert_tpu.core.metrics import AverageMeter, accuracy_topk
