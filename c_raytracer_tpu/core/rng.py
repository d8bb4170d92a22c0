"""Uniform random sampling for the renderer's Monte-Carlo estimators.

The reference uses libc ``rand()`` seeded by wall time and raced across
OpenMP threads (system.c:36-39, 93-96) — irreproducible by design; we match
the *estimand*, not the stream (SURVEY.md §3.5).  That freedom lets the TPU
path use the hardware PRNG: ``jax.random.uniform`` (threefry) costs ~10%
of a scene1 frame in pure ALU work, while the TPU core has a native PRNG
reachable only through Pallas (``pltpu.prng_random_bits``), which emits
random words at near-register speed.

``uniform(key, shape)`` is a drop-in for ``jax.random.uniform``:

* on TPU it derives a per-call seed from the JAX key and fills the shape
  from the hardware PRNG via a gridded Pallas kernel (deterministic for a
  fixed key/shape — same seed, same stream);
* everywhere else (CPU tests, interpret mode) it falls back to threefry.

The two backends produce different streams; both sample U[0,1) and all
consumers are tolerance-gated Monte-Carlo estimators.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

_COLS = 512           # lane-dim of generated blocks (multiple of 128)
_BLOCK_ROWS = 256     # sublane-dim per grid step (256x512 u32 = 512 KiB)


def _key_words(key):
    """(2,) int32 words from either a typed key or a raw uint32 pair."""
    if jnp.issubdtype(key.dtype, jax.dtypes.prng_key):
        kd = jax.random.key_data(key)
    else:
        kd = key
    kd = kd.reshape(-1)[:2].astype(jnp.uint32)
    return kd.view(jnp.int32) if hasattr(kd, "view") else kd


def _bits_kernel(seed_ref, out_ref):
    from jax.experimental.pallas import tpu as pltpu
    import jax.experimental.pallas as pl

    # distinct stream per grid block: fold the block id into the seed
    pid = pl.program_id(0)
    pltpu.prng_seed(seed_ref[0] + pid * jnp.int32(-1640531527),  # 2^32·φ
                    seed_ref[1])
    out_ref[:] = pltpu.bitcast(
        pltpu.prng_random_bits(out_ref.shape), jnp.uint32)


@functools.partial(jax.jit, static_argnums=(1,))
def _hw_bits(seed, padded_rows):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    grid = padded_rows // _BLOCK_ROWS
    return pl.pallas_call(
        _bits_kernel,
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((_BLOCK_ROWS, _COLS), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((padded_rows, _COLS), jnp.uint32),
    )(seed)


@functools.partial(jax.jit, static_argnums=(1, 2))
def _hw_bits_2d(seed, rows, cols):
    """(rows, cols) u32 with cols a multiple of _COLS: grid over both axes
    so the requested trailing axis IS the generated lane axis — no
    flatten/reshape relayout afterwards (a (2, 40, 65536) f32 relayout from
    the (n//512, 512) generation shape measured 5.5 ms/array at 1024²)."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    # block dims must DIVIDE the output dims: the grid below floor-divides,
    # so a non-dividing block would leave trailing output blocks unwritten
    # (uninitialized memory returned as "uniform" samples).  rows is
    # sublane-aligned (multiple of 8) by the caller, so 8 always divides.
    block_rows = min(_BLOCK_ROWS, rows)
    while rows % block_rows:
        block_rows -= 8
    # wide blocks: fewer programs → fewer reseeds (the seed computation is
    # scalar-unit work serialized against the vector PRNG fill)
    block_cols = _COLS
    while (block_cols * 2 <= cols and cols % (block_cols * 2) == 0
           and block_rows * block_cols * 8 <= 2 ** 21):
        block_cols *= 2
    grid = (rows // block_rows, cols // block_cols)

    def kernel(seed_ref, out_ref):
        pid = pl.program_id(0) * pl.num_programs(1) + pl.program_id(1)
        pltpu.prng_seed(seed_ref[0] + pid * jnp.int32(-1640531527),
                        seed_ref[1])
        out_ref[:] = pltpu.bitcast(
            pltpu.prng_random_bits(out_ref.shape), jnp.uint32)

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((block_rows, block_cols), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, cols), jnp.uint32),
    )(seed)


def hw_uniform(key, shape):
    """U[0,1) of ``shape`` from the TPU hardware PRNG (top 24 bits)."""
    n = math.prod(shape) if shape else 1
    # layout-preserving fast path: trailing axis a lane multiple → generate
    # (lead, trail) directly; the final reshape only splits the leading
    # axis, which keeps the minor layout (free), instead of relaying out
    if shape and shape[-1] % _COLS == 0:
        trail = shape[-1]
        lead = n // trail
        rows = -(-lead // 8) * 8          # sublane-aligned
        bits = _hw_bits_2d(_key_words(key), rows, trail)
        u = ((bits >> jnp.uint32(8)).astype(jnp.float32)
             * jnp.float32(2.0 ** -24))
        return u[:lead].reshape(shape)
    rows = -(-n // _COLS)
    padded_rows = max(_BLOCK_ROWS, -(-rows // _BLOCK_ROWS) * _BLOCK_ROWS)
    bits = _hw_bits(_key_words(key), padded_rows)
    u = (bits >> jnp.uint32(8)).astype(jnp.float32) * jnp.float32(2.0 ** -24)
    return u.reshape(-1)[:n].reshape(shape)


def _target_platform() -> str:
    """Platform the traced computation will compile for: honors an active
    ``jax.default_device`` override (e.g. the CPU-backend consistency test
    running inside a TPU session), else the default backend."""
    dd = jax.config.jax_default_device
    if dd is not None:
        return dd.platform
    return jax.default_backend()


def uniform(key, shape, dtype=jnp.float32):
    """Drop-in for jax.random.uniform; hardware PRNG on TPU."""
    if _target_platform() == "tpu":
        return hw_uniform(key, shape).astype(dtype)
    return jax.random.uniform(key, shape, dtype)
