from c_raytracer_tpu.textures.textures import texture_color  # noqa: F401
