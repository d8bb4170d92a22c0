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


def _enable_persistent_compile_cache():
    """Wavefront programs are scan/cond-heavy and compile slowly (minutes on
    the remote-compiled TPU backend); the persistent cache makes every repeat
    invocation (CLI runs, benchmarks, test re-runs) start in seconds.
    Opt out with CRT_NO_COMPILE_CACHE=1 or by setting your own cache dir."""
    import os
    if os.environ.get("CRT_NO_COMPILE_CACHE"):
        return
    try:
        import jax
        if jax.config.jax_compilation_cache_dir is None:
            jax.config.update(
                "jax_compilation_cache_dir",
                os.environ.get(
                    "JAX_COMPILATION_CACHE_DIR",
                    os.path.expanduser("~/.cache/c_raytracer_tpu/jax")))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


_enable_persistent_compile_cache()
