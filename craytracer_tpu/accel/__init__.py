from craytracer_tpu.accel.bvh import BVHArrays, build_bvh, bvh_closest_hit, bvh_any_hit  # noqa: F401
from craytracer_tpu.accel.grid import GridArrays, build_grid, grid_closest_hit, grid_any_hit  # noqa: F401
from craytracer_tpu.accel.bvh4 import BVH4Arrays, build_bvh4, bvh4_closest_hit, bvh4_any_hit  # noqa: F401
