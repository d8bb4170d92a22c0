"""Host-side acceleration build: Morton ordering of triangles.

The reference builds a binary LBVH over all bounded objects
(accel.c:266-315).  The TPU-native structure is flatter: triangles are
sorted by the Morton code of their AABB centroid (the reference's exact
code construction, accel.c:72-88,290-308) and grouped into fixed-size
contiguous *clusters*; the device traversal (traverse.py) slab-tests
cluster AABBs densely and sweeps the nearest clusters' triangles.  Cluster
AABBs are re-fit on device from the differentiable vertices each render, so
only the *ordering* is host-side state — and any ordering is correct, the
Morton sort just makes clusters spatially tight.

Spheres and planes are few in every reference scene and stay brute-force
(planes are excluded from the reference BVH too, object.h:84).
"""

from __future__ import annotations

import dataclasses

import numpy as np

from c_raytracer_tpu.accel import native
from c_raytracer_tpu.scene import types as T


def expand_bits_np(v: np.ndarray) -> np.ndarray:
    """Vectorized expand_bits (accel.c:72-80)."""
    v = v.astype(np.uint32)
    v = (v * np.uint32(0x00010001)) & np.uint32(0xFF0000FF)
    v = (v * np.uint32(0x00000101)) & np.uint32(0x0F00F00F)
    v = (v * np.uint32(0x00000011)) & np.uint32(0xC30C30C3)
    v = (v * np.uint32(0x00000005)) & np.uint32(0x49249249)
    return v


def morton_codes_np(centroids: np.ndarray) -> np.ndarray:
    """30-bit Morton codes of centroids normalized to their extents
    (accel.c:82-88, 290-308)."""
    c = np.asarray(centroids, np.float32)
    lo = c.min(0)
    span = c.max(0) - lo
    inv = np.where(span > 0, 1.0 / np.where(span > 0, span, 1.0), 0.0)
    n = (c - lo) * inv
    q = np.clip(n * 1024.0, 0.0, 1023.0).astype(np.uint32)
    return ((expand_bits_np(q[:, 0]) << np.uint32(2))
            | (expand_bits_np(q[:, 1]) << np.uint32(1))
            | expand_bits_np(q[:, 2]))


def morton_order(tri_vertices: np.ndarray) -> np.ndarray:
    """Morton-sorted permutation of triangles (native C++ if available,
    NumPy otherwise — bit-identical)."""
    tv = np.asarray(tri_vertices, np.float32)
    if tv.shape[0] == 0:
        return np.zeros((0,), np.int64)
    # centroid of the triangle's AABB, like the reference's per-object
    # bounding-cuboid centroid (accel.c:292-299 over get_corners output)
    cen = 0.5 * (tv.min(1) + tv.max(1))
    out = native.morton_sort(cen)
    if out is not None:
        return out[0]
    codes = morton_codes_np(cen)
    return np.argsort(codes, kind="stable")


def reorder_scene(scene: T.Scene) -> T.Scene:
    """Return an equivalent Scene with triangles in Morton order.

    Pure permutation: params.tri_vertices rows and every per-triangle
    static table are permuted together, and emitter/global primitive ids
    remapped, so rendering is identical up to float summation order."""
    st = scene.static
    nt = st.n_triangles
    if nt <= 1:
        return scene
    ns = st.n_spheres
    perm = morton_order(np.asarray(scene.params.tri_vertices))

    params = dataclasses.replace(
        scene.params, tri_vertices=scene.params.tri_vertices[perm])

    # old triangle index -> new triangle index
    inv = np.empty(nt, np.int64)
    inv[perm] = np.arange(nt)

    def permute_tuple(tup):
        head, tri, tail = tup[:ns], tup[ns:ns + nt], tup[ns + nt:]
        tri = tuple(tri[int(i)] for i in perm)
        return head + tri + tail

    def remap_gid(g):
        if ns <= g < ns + nt:
            return ns + int(inv[g - ns])
        return g

    static = dataclasses.replace(
        st,
        material_index=permute_tuple(st.material_index),
        epsilon=permute_tuple(st.epsilon),
        num_lights=permute_tuple(st.num_lights),
        emitter_prims=tuple(sorted(remap_gid(g)
                                   for g in st.emitter_prims)),
    )
    return T.Scene(params=params, static=static, aux=scene.aux)
