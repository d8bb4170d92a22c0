from c_raytracer_tpu.geometry.primitives import (  # noqa: F401
    DeviceScene, any_hit_tint, closest_hit, device_scene, intersect_prim)
