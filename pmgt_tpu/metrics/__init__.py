from pmgt_tpu.metrics.ranking import get_ndcg, get_recall, roc_auc  # noqa: F401
