from pmgt_tpu.graph.container import PaddedGraph  # noqa: F401
