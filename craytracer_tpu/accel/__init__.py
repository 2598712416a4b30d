from craytracer_tpu.accel.bvh import BVHArrays, build_bvh, bvh_closest_hit, bvh_any_hit  # noqa: F401
from craytracer_tpu.accel.grid import GridArrays, build_grid, grid_closest_hit, grid_any_hit  # noqa: F401
