"""Workload modules.

Each workload exposes the reference's uniform 7-function module contract
(consumed by the reference CLI at train.py:317-339):

    check_args / init_run / init_dataloader / init_model / train / test /
    inference

plus an engine ``Task`` implementation that owns the jitted step functions.
"""
