"""Fused Pallas visit-order kernel: slab test + sorted top-V extraction
with the (R, K) keys VMEM-resident.

The XLA `_visit_order` path (traverse.py) materializes the (R, K) slab
keys to HBM and then runs `lax.top_k` — a variadic sort measured at
155 ms/frame across the two visit-order phases on scene4 512²
(PERFORMANCE.md round 3).  The iterative min-extraction (`_k_smallest`)
loses there too because its V passes re-stream the keys from HBM.  This
kernel computes the keys for a block of rays in VMEM and extracts the V
nearest clusters in place — the keys never touch HBM, and the extraction
is V VPU sweeps over resident data.

Numerics match `_visit_order` exactly: same robust slab test (Williams et
al., accel.c:111-158 — the d≈0 nudge included), entry = max(tmin, 0),
ascending entry order with ties to the lowest cluster id.  Outputs
(cids int32 (R, V), entry f32 (R, V)); `ok` is `entry < FLT_MAX`.

Eligibility: TPU target, K padded to a lane multiple by the caller with
lo = hi = +inf rows (for any ray those give tmin=+inf or tmax=-inf —
never an overlap; note lo=+inf/hi=-inf does NOT work: the slab min/max
re-sorts the inverted box into an everything-matcher with entry 0),
block keys ≤ ~4 MB of VMEM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

FLT_MAX = float(np.finfo(np.float32).max)


def _kernel(o_ref, d_ref, lo_ref, hi_ref, cids_ref, entry_ref,
            tmin_ref, tmax_ref, *, V, K):
    """Outputs are TRANSPOSED (V, BR): the extraction loop stores row v
    with a dynamic sublane index (dynamic LANE stores are not a thing);
    the wrapper transposes back.  The slab accumulators and the key block
    live in dedicated VMEM scratch — the fully-unrolled first version
    allocated a stack slot per intermediate of every extraction pass and
    blew Mosaic's scoped-VMEM limit at any useful block size."""
    import jax.experimental.pallas as pl

    BR = o_ref.shape[0]
    tmin_ref[:] = jnp.full((BR, K), -FLT_MAX, jnp.float32)
    tmax_ref[:] = jnp.full((BR, K), FLT_MAX, jnp.float32)
    for c in range(3):
        dc = d_ref[:, c][:, None]                       # (BR, 1)
        dd = jnp.where(jnp.abs(dc) < 1e-30, 1e-30, dc)
        inv = 1.0 / dd
        oc = o_ref[:, c][:, None]
        lo_c = lo_ref[:, c][None, :]                    # (1, K)
        hi_c = hi_ref[:, c][None, :]
        t1 = (lo_c - oc) * inv
        t2 = (hi_c - oc) * inv
        tmin_ref[:] = jnp.maximum(tmin_ref[:], jnp.minimum(t1, t2))
        tmax_ref[:] = jnp.minimum(tmax_ref[:], jnp.maximum(t1, t2))
    entry = jnp.maximum(tmin_ref[:], 0.0)
    # tmin_ref becomes the working key block for the extraction
    tmin_ref[:] = jnp.where(tmax_ref[:] >= entry, entry, FLT_MAX)

    iota = jax.lax.broadcasted_iota(jnp.int32, (BR, K), 1)

    def extract(v, _):
        cur = tmin_ref[:]
        m = jnp.min(cur, axis=1)                        # (BR,)
        ism = cur == m[:, None]
        first = jnp.min(jnp.where(ism, iota, K), axis=1)
        first = jnp.minimum(first, K - 1)
        cids_ref[pl.ds(v, 1), :] = first[None, :]
        entry_ref[pl.ds(v, 1), :] = m[None, :]
        tmin_ref[:] = jnp.where(iota == first[:, None], FLT_MAX, cur)
        return 0

    jax.lax.fori_loop(0, V, extract, 0)


@functools.partial(jax.jit,
                   static_argnames=("V", "block_rays", "interpret"))
def visit_order_fused(o, d, lo, hi, *, V, block_rays=128, interpret=False):
    """(cids (R, V) int32, entry (R, V) f32) — nearest-V slab-overlapped
    clusters per ray, ascending entry, first-index ties.

    o, d: (R, 3) f32 (R a multiple of block_rays — callers pad);
    lo, hi: (K, 3) cluster AABBs (pad rows lo = hi = +inf)."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R = o.shape[0]
    K = lo.shape[0]
    assert R % block_rays == 0, (R, block_rays)
    grid = (R // block_rays,)
    kernel = functools.partial(_kernel, V=V, K=K)
    params = pltpu.CompilerParams(
        vmem_limit_bytes=100 * 1024 * 1024)
    cids_t, entry_t = pl.pallas_call(
        kernel,
        grid=grid,
        compiler_params=params,
        in_specs=[
            pl.BlockSpec((block_rays, 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rays, 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),      # lo, full
            pl.BlockSpec(memory_space=pltpu.VMEM),      # hi, full
        ],
        out_specs=(
            # transposed (V, BR) blocks: the extraction stores row v with
            # a dynamic sublane index (dynamic lane stores don't exist)
            pl.BlockSpec((V, block_rays), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((V, block_rays), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((V, R), jnp.int32),
            jax.ShapeDtypeStruct((V, R), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_rays, K), jnp.float32),   # tmin / key block
            pltpu.VMEM((block_rays, K), jnp.float32),   # tmax
        ],
        interpret=interpret,
    )(o, d, lo, hi)
    return cids_t.T, entry_t.T


def eligible(R: int, K: int, V: int, platform: str,
             block_rays: int = 128) -> bool:
    """VMEM budget: two (BR, K) scratch blocks plus a handful of loop
    temporaries must fit the scoped limit."""
    if platform != "tpu":
        return False
    if V > 64:
        return False
    key_bytes = block_rays * K * 4
    return key_bytes * 6 <= 64 * 2 ** 20
