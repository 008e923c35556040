from pmgt_tpu.core.config import PMGTConfig, TrainArgs  # noqa: F401
from pmgt_tpu.core.mesh import make_mesh, shard_batch  # noqa: F401
