"""Base utilities (reference pmgt/utils/base.py).

``save_args`` lives on TrainArgs (core/config.py); determinism on TPU is
handled by JAX's explicit PRNG keys (all sampling/dropout keys derive from
``args.seed``), so ``set_seed`` only needs to pin the host-side numpy/
python RNGs used for shuffling and splits.
"""
from __future__ import annotations

import functools
import logging
import random
import time

import numpy as np

logger = logging.getLogger("pmgt_tpu")


def set_seed(seed: int) -> None:
    """Host-side seeding (reference utils/base.py:35-39; the cudnn
    determinism flag has no TPU equivalent — XLA is deterministic given
    fixed PRNG keys)."""
    random.seed(seed)
    np.random.seed(seed)


def log_elapsed_time(func):
    """Wall-clock decorator (reference utils/base.py:20-32)."""

    @functools.wraps(func)
    def wrapper(*args, **kwargs):
        start = time.time()
        result = func(*args, **kwargs)
        logger.info("elapsed time of %s: %.1fs", func.__name__, time.time() - start)
        return result

    return wrapper
