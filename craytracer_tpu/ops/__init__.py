from craytracer_tpu.ops.intersect import Hit, intersect_scene, shadow_distance  # noqa: F401
