"""Per-pass render metrics — the structured replacement for the reference's
printf counters (intersect counts intersect.h:363-364, traversal time
intersect.h:11-13, progress main.cpp:70-86, grid stats uniformgrid.h:135-148).

`trace_paths(..., with_metrics=True)` produces the on-device counters; this
module turns them into the host-side metrics dict {rays/s, per-bounce
occupancy, NaN count} that the renderer logs.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

import numpy as np


@dataclass
class PassMetrics:
    rays: int = 0
    shadow_rays: int = 0
    bounce_live: np.ndarray = None
    wall_s: float = 0.0
    nan_pixels: int = 0

    @property
    def total_rays(self) -> int:
        return self.rays + self.shadow_rays

    @property
    def rays_per_sec(self) -> float:
        return self.total_rays / self.wall_s if self.wall_s > 0 else 0.0

    @property
    def occupancy(self) -> np.ndarray:
        """Live-lane fraction per bounce (wavefront divergence profile)."""
        bl = np.asarray(self.bounce_live, np.float64)
        return bl / max(bl[0], 1)

    def summary(self) -> str:
        occ = ", ".join(f"{x:.2f}" for x in self.occupancy)
        return (f"{self.rays_per_sec / 1e6:8.1f}M rays/s "
                f"({self.rays} closest + {self.shadow_rays} shadow in "
                f"{self.wall_s * 1e3:.1f}ms) occupancy/bounce [{occ}]"
                + (f" NaN={self.nan_pixels}" if self.nan_pixels else ""))


def collect(metrics_dev, radiance, wall_s: float) -> PassMetrics:
    """Pull device counters + NaN detection (the wavefront analog of the
    reference's per-sample NaN scan, main.cpp:127-136)."""
    nan_px = int(np.asarray(np.isnan(np.asarray(radiance)).any(axis=-1)).sum())
    return PassMetrics(
        rays=int(metrics_dev["rays"]),
        shadow_rays=int(metrics_dev["shadow_rays"]),
        bounce_live=np.asarray(metrics_dev["bounce_live"]),
        wall_s=wall_s,
        nan_pixels=nan_px,
    )
