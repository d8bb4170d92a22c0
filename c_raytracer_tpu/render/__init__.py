from c_raytracer_tpu.render.api import make_renderer, render  # noqa: F401
from c_raytracer_tpu.render.config import RenderConfig  # noqa: F401
from c_raytracer_tpu.render.progressive import render_progressive  # noqa: F401
