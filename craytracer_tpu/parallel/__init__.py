from craytracer_tpu.parallel.sharded import (  # noqa: F401
    make_mesh,
    sharded_render_pass,
    sharded_train_step,
)
from craytracer_tpu.parallel.geom import (  # noqa: F401
    geom_sharded_render_pass,
    geom_sharded_train_step,
    make_geom_mesh,
    reduce_hit,
    shard_scene_geometry,
)
