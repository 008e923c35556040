from pmgt_tpu.utils.base import log_elapsed_time, set_seed  # noqa: F401
from pmgt_tpu.utils.train import dynamic_clip_by_norm_history  # noqa: F401
