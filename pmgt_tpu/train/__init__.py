from pmgt_tpu.train.optim import make_optimizer, make_schedule  # noqa: F401
from pmgt_tpu.train.registry import RunRegistry  # noqa: F401
