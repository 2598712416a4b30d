"""config.txt parsing (parseConfigFile, config.h:10-103)."""

from __future__ import annotations

from dataclasses import dataclass


@dataclass
class ConfigParams:
    scene_file: str = "cornell_box.txt"
    num_samples: int = 1
    num_sample_sets: int = 83
    max_depth: int = 1
    trace_type: str = "PATHTRACE"  # RAYCAST | WHITTED | PATHTRACE
    accel_struct: str = "GRID"  # BVH | BVH4 | GRID | NONE
    image_save: bool = False
    caustic_map: bool = False


def parse_config(path: str) -> ConfigParams:
    cfg = ConfigParams()
    with open(path) as f:
        for line in f:
            parts = line.split()
            if len(parts) < 2 or parts[0].startswith("#"):
                continue
            key, val = parts[0], parts[1]
            if key == "scene_file":
                cfg.scene_file = val
            elif key == "num_samples":
                cfg.num_samples = int(val)
            elif key == "num_sample_sets":
                cfg.num_sample_sets = int(val)
            elif key == "max_depth":
                cfg.max_depth = int(val)
            elif key == "trace_type":
                cfg.trace_type = val
            elif key == "accel_struct":
                cfg.accel_struct = val
            elif key == "image_save":
                cfg.image_save = val.lower() in ("yes", "true", "1")
            elif key == "caustic_map":
                cfg.caustic_map = val.lower() in ("yes", "true", "1")
    return cfg
