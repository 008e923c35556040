from pmgt_tpu.models.pmgt import (  # noqa: F401
    PMGTForPreTraining,
    PMGTModel,
)
from pmgt_tpu.models.ncf import NCF, fuse_neumf_params  # noqa: F401
from pmgt_tpu.models.dcn import DCN  # noqa: F401
