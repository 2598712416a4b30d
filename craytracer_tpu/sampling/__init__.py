from craytracer_tpu.sampling.rng import uniforms, hash_u32  # noqa: F401
from craytracer_tpu.sampling.mappings import (  # noqa: F401
    map_to_disk_polar,
    map_to_disk_concentric,
    map_to_hemisphere_cosine,
    map_to_cos_power,
)
