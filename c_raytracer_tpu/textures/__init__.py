from c_raytracer_tpu.textures.textures import (  # noqa: F401
    texture_color, texture_color_soa)
