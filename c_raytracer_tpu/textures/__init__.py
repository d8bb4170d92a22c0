from c_raytracer_tpu.textures.textures import texture_color_soa  # noqa: F401
