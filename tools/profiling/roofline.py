"""Empirical roofline anchors for the one attached TPU chip.

Measures achieved ceilings with microbenchmarks (the honest basis for any
"speed-of-light" claim — chip spec sheets quote MXU bf16 FLOPs, but this
framework's hot loops are f32 VPU + HBM bound):

* ``hbm``   — streaming bandwidth: y = x + 1 over a large f32 array
              (reads N·4, writes N·4 bytes per call).
* ``vpu``   — f32 elementwise FLOPs: a chain of K fused multiply-adds on
              a VMEM-resident-per-tile block (2·K FLOPs/element; HBM
              traffic amortized to nothing).
* ``trans`` — transcendental rate: a chain of sin() calls (the shading
              path is sin/cos/pow heavy).
* ``gather``— random-row gather bandwidth: rows pulled from a (K, F·C)
              table by random indices — the cluster sweep's block-gather
              primitive ``cs.blk[cid]``.

Each probe stays far under the tunnel's ~20 s device-call kill.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python tools/profiling/roofline.py
Prints one JSON line per probe.
"""
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def _sync(out):
    """Force completion: block_until_ready alone does not synchronize
    through the axon tunnel (measured: 4 GiB streams 'finish' in 50 µs);
    a device→host readback of one element cannot resolve early."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(np.asarray(leaf.ravel()[0]))


def timeit(fn, x, iters=10):
    """Chained timing: each iteration consumes the previous output, so
    no relay/runtime layer can elide or overlap repeated identical calls
    (the first probe attempt measured 47 TB/s 'bandwidth' — repeated
    f(x) with a constant input is not a benchmark on this stack)."""
    y = fn(x)
    _sync(y)
    t0 = time.perf_counter()
    for _ in range(iters):
        y = fn(y)
    _sync(y)
    return (time.perf_counter() - t0) / iters


def probe_hbm():
    N = 256 * 1024 * 1024          # 1 GiB f32
    x = jnp.zeros((N,), jnp.float32)
    f = jax.jit(lambda x: x * 0.5 + 0.25)   # bounded fixed point
    dt = timeit(f, x)
    gbps = 2 * N * 4 / dt / 1e9
    print(json.dumps({"probe": "hbm_stream", "bytes_per_call": 2 * N * 4,
                      "seconds": round(dt, 5),
                      "achieved_GBps": round(gbps, 1)}), flush=True)
    return gbps


def probe_vpu():
    N = 16 * 1024 * 1024
    K = 256
    x = jnp.zeros((N,), jnp.float32)

    @jax.jit
    def f(x):
        a = jnp.float32(0.999999)
        b = jnp.float32(1e-7)
        y = x
        for _ in range(K):
            y = y * a + b
        return y

    dt = timeit(f, x)
    tflops = 2 * K * N / dt / 1e12
    print(json.dumps({"probe": "vpu_f32_fma_chain", "flops_per_el": 2 * K,
                      "seconds": round(dt, 5),
                      "achieved_f32_TFLOPs": round(tflops, 2)}), flush=True)
    return tflops


def probe_trans():
    N = 16 * 1024 * 1024
    K = 32
    x = jnp.linspace(0, 1, N, dtype=jnp.float32)

    @jax.jit
    def f(x):
        y = x
        for _ in range(K):
            y = jnp.sin(y)
        return y

    dt = timeit(f, x)
    rate = K * N / dt / 1e9
    print(json.dumps({"probe": "transcendental_sin_chain",
                      "seconds": round(dt, 5),
                      "achieved_Gsin_per_s": round(rate, 2)}), flush=True)
    return rate


def probe_pow():
    """powf rate (the specular term fmax0_powf — one per shadow sample)."""
    N = 16 * 1024 * 1024
    K = 16
    x = jnp.linspace(0.1, 0.9, N, dtype=jnp.float32)

    @jax.jit
    def f(x):
        y = x
        for _ in range(K):
            y = jnp.power(y, jnp.float32(1.001)) * jnp.float32(0.999)
        return y

    dt = timeit(f, x)
    rate = K * N / dt / 1e9
    print(json.dumps({"probe": "pow_chain", "seconds": round(dt, 5),
                      "achieved_Gpow_per_s": round(rate, 2)}), flush=True)
    return rate


def probe_div():
    """f32 divide rate (attenuation/normalize divisions)."""
    N = 16 * 1024 * 1024
    K = 64
    x = jnp.full((N,), 1.5, jnp.float32)

    @jax.jit
    def f(x):
        y = x
        for _ in range(K):
            y = jnp.float32(2.25) / (y + jnp.float32(0.01))
        return y

    dt = timeit(f, x)
    rate = K * N / dt / 1e9
    print(json.dumps({"probe": "div_chain", "seconds": round(dt, 5),
                      "achieved_Gdiv_per_s": round(rate, 2)}), flush=True)
    return rate


def probe_gather(K=1725, F=13, C=64, R=2048 * 40):
    """Random-row gather like the sweep body's cs.blk[cid]: R rows of
    F·C f32 each from a K-row table.  Chained through the index vector
    (idx + 0·out) so iterations serialize."""
    rows = K
    width = F * C
    tbl = jnp.asarray(np.random.rand(rows, width), jnp.float32)
    idx0 = jnp.asarray(np.random.randint(0, rows, (R,)), jnp.int32)

    @jax.jit
    def f(idx):
        out = jnp.sum(tbl[idx], axis=-1)              # (R,)
        dep = (out * 0.0).astype(jnp.int32)           # serial dependency
        return idx + dep

    dt = timeit(f, idx0)
    gbps = R * width * 4 / dt / 1e9
    print(json.dumps({"probe": "row_gather", "rows": rows,
                      "row_bytes": width * 4, "gathers": R,
                      "seconds": round(dt, 5),
                      "achieved_GBps": round(gbps, 1)}), flush=True)
    return gbps


def main():
    print(f"device: {jax.devices()[0]}", file=sys.stderr)
    probe_hbm()
    probe_vpu()
    probe_trans()
    probe_pow()
    probe_div()
    probe_gather()


if __name__ == "__main__":
    main()
