"""Seeding (reference: /root/reference/minivllm/utils/random_utils.py:20-43).

JAX threads PRNG keys explicitly through the engine (the runner derives a
fresh key per step from config.seed), so unlike torch there is no global
device RNG to seed — this seeds the host-side generators used by data
preparation and any numpy-based tooling.
"""

from __future__ import annotations

import random

import numpy as np

__all__ = ["set_random_seed"]


def set_random_seed(seed: int) -> None:
    random.seed(seed)
    np.random.seed(seed)
