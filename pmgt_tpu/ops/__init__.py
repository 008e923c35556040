from pmgt_tpu.ops.dual_attention import dual_attention_pallas  # noqa: F401
