from c_raytracer_tpu.geometry.primitives import (  # noqa: F401
    DeviceScene, any_hit_tint_soa, closest_hit_soa, device_scene,
    intersect_prim, intersect_prim_soa)
