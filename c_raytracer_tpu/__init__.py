"""c_raytracer_tpu — a TPU-native differentiable raytracer / path tracer.

Brand-new JAX/XLA/Pallas framework with the capabilities of the reference C
raytracer (wojciech-graj/C-Raytracer): Whitted raytracing with soft shadows,
reflection/refraction, single-bounce path-traced global illumination,
procedural textures (incl. simplex noise), BVH acceleration, TIFF output and a
separate postprocessing stage (brighten / depth-of-field / mist).

Architecture (idiomatic JAX, not a translation):
  * scene state is a structure-of-arrays pytree (``scene.types``) — the
    differentiable "model weights" of the renderer;
  * rendering is a megakernel-free wavefront: a ``lax.scan`` over bounce
    rounds with per-pixel ray stacks (``render.integrator``);
  * parallelism is a ``jax.sharding.Mesh`` over pixel tiles and Monte-Carlo
    samples (``parallel``), not OpenMP threads.
"""

__version__ = "0.1.0"
