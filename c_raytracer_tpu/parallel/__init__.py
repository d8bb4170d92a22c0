from c_raytracer_tpu.parallel.mesh import make_mesh  # noqa: F401
from c_raytracer_tpu.parallel.render_sharded import (  # noqa: F401
    make_sharded_renderer)
from c_raytracer_tpu.parallel.train import make_train_step  # noqa: F401
