from craytracer_tpu.lights.lights import env_radiance, sample_one_light  # noqa: F401
