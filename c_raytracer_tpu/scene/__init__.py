from c_raytracer_tpu.scene.loader import load_scene  # noqa: F401
from c_raytracer_tpu.scene.types import (  # noqa: F401
    Camera, Materials, Scene, SceneParams, SceneStatic, make_scene)
