"""Device mesh setup for multi-chip proving.

The reference is single-threaded (SURVEY.md section 2.4); everything here is
new TPU-native design: a 1-D mesh over the evaluation domain, with NTT
butterfly stages exchanged all-to-all over ICI (BASELINE.json north star).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
from jax.sharding import Mesh


def make_mesh(n_devices: Optional[int] = None, axis_name: str = "shard") -> Mesh:
    devices = jax.devices()
    n = n_devices or len(devices)
    if n > len(devices):
        raise ValueError(f"requested {n} devices, only {len(devices)} available")
    import numpy as np
    return Mesh(np.array(devices[:n]), (axis_name,))
