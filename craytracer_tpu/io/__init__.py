from craytracer_tpu.io.image import write_ppm, read_ppm  # noqa: F401
from craytracer_tpu.io.imagestate import save_image_state, load_image_state  # noqa: F401
