from pmgt_tpu.sampling.mcn import sample_context  # noqa: F401
from pmgt_tpu.sampling.pairs import (  # noqa: F401
    PretrainBatch,
    make_pretrain_batch,
    sample_pairs,
)
