"""Process-rank-aware logging + seeding utilities.

Reference: `fish_speech/utils/logger.py` (RankedLogger) and
`utils/utils.py:120-136` (set_seed).
"""

from __future__ import annotations

import logging
import os
import random
from typing import Optional

import numpy as np


def process_index() -> int:
    try:
        import jax

        return jax.process_index()
    except Exception:
        return int(os.environ.get("RANK", 0))


class RankedLogger(logging.LoggerAdapter):
    """Prefixes records with the process rank; optionally logs on rank 0
    only."""

    def __init__(self, name: str = __name__, rank_zero_only: bool = False):
        super().__init__(logging.getLogger(name), {})
        self.rank_zero_only = rank_zero_only

    def log(self, level, msg, *args, rank: Optional[int] = None, **kwargs):
        if not self.isEnabledFor(level):
            return
        current = process_index()
        msg = f"[rank: {current}] {msg}"
        if self.rank_zero_only or rank is not None:
            target = 0 if self.rank_zero_only else rank
            if current != target:
                return
        self.logger.log(level, msg, *args, **kwargs)


def set_seed(seed: int):
    """Seed python/numpy and return a jax PRNG key (jax RNG is explicit)."""
    random.seed(seed)
    np.random.seed(seed)
    try:
        import jax

        return jax.random.PRNGKey(seed)
    except Exception:
        return None
