from craytracer_tpu.parallel.sharded import (  # noqa: F401
    make_mesh,
    sharded_render_pass,
    sharded_train_step,
)
