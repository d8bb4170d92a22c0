from c_raytracer_tpu.core import cmath, noise, vec  # noqa: F401
