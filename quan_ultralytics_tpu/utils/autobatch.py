"""AutoBatch: pick a batch size from a static HBM model.

Reference utils/autobatch.py probes CUDA memory fractions at runtime; TPU
memory behavior is static under XLA, so the batch size comes from an
analytic activation-memory estimate against the chip's HBM instead of an
allocation probe.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np


def device_hbm_bytes(default_gb: float = 16.0) -> float:
    """HBM of device 0 (v5e: 16 GB)."""
    try:
        stats = jax.devices()[0].memory_stats()
        if stats and "bytes_limit" in stats:
            return float(stats["bytes_limit"])
    except Exception:
        pass
    return default_gb * (1 << 30)


def estimate_activation_bytes_per_image(model, imgsz: int, dtype_bytes: int = 2) -> float:
    """Sum of layer output activation sizes (fwd + ~2x for bwd residuals)."""
    total = 0.0
    for s in model.specs:
        if s.c2 <= 0 or s.stride <= 0:
            continue
        hw = (imgsz / s.stride) ** 2
        total += hw * s.c2 * dtype_bytes
    return total * 3.0  # fwd + grad residuals headroom


def auto_batch(model, imgsz: int = 640, fraction: float = 0.60,
               params_bytes: Optional[float] = None, max_batch: int = 1024) -> int:
    """Largest power-of-two batch fitting `fraction` of HBM (reference
    autobatch.py:14-105 uses the same 0.6 default fraction)."""
    hbm = device_hbm_bytes() * fraction
    per_img = estimate_activation_bytes_per_image(model, imgsz)
    fixed = (params_bytes or 0.0) * 4  # params + grads + 2x optimizer moments
    avail = max(hbm - fixed, per_img)
    b = int(avail // per_img)
    return int(min(max(2 ** int(np.log2(max(b, 1))), 1), max_batch))
