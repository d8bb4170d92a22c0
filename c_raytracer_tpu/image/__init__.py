from c_raytracer_tpu.image.tiff import (  # noqa: F401
    read_tiff, write_tiff_raw, write_tiff_rgb8)
