from craytracer_tpu.integrator.wavefront import trace_paths, render_sample  # noqa: F401
from craytracer_tpu.integrator.render import Renderer, RenderConfig  # noqa: F401
