from craytracer_tpu.core import math as vmath  # noqa: F401
from craytracer_tpu.core import solvers  # noqa: F401
from craytracer_tpu.core import aabb  # noqa: F401
