from craytracer_tpu.utils.tonemap import tone_map  # noqa: F401
