from craytracer_tpu.scene.types import (  # noqa: F401
    Scene,
    Spheres,
    Planes,
    Rects,
    Disks,
    Triangles,
    Instanced,
    Materials,
    Lights,
    EnvLight,
    TexturePack,
)
from craytracer_tpu.scene.build import SceneBuilder  # noqa: F401
