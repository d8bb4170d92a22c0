"""Generate substitute meshes for the reference files missing from the
mount (meshes/dragon.stl, meshes/menger_sponge.stl — see
/root/reference/.MISSING_LARGE_BLOBS).

The originals are the Stanford dragon (~100k triangles) and a level-3
Menger sponge; the substitutes match their scale class and BVH-stress
character (dense curved surface / axis-aligned fractal) so scene5/scene6
load unmodified and the benchmarks exercise the same regime.  Golden
bit-match against the reference renders is impossible for these scenes
either way (the reference binary cannot render them without the files).

Usage: python tools/gen_meshes.py [outdir]   (default: assets/meshes/)
"""

from __future__ import annotations

import os
import sys

import numpy as np


def torus_knot(p=2, q=3, segs=700, ring=72, R=1.0, r=0.35,
               tube=0.28) -> np.ndarray:
    """(p,q) torus-knot tube, ~2*segs*ring triangles (~100k default)."""
    t = np.linspace(0, 2 * np.pi, segs, endpoint=False)
    # knot centerline
    cr = R + r * np.cos(q * t)
    cx = cr * np.cos(p * t)
    cy = cr * np.sin(p * t)
    cz = -r * np.sin(q * t)
    c = np.stack([cx, cy, cz], -1)                       # (S, 3)
    # local frame via finite differences
    tang = np.roll(c, -1, 0) - np.roll(c, 1, 0)
    tang /= np.linalg.norm(tang, axis=-1, keepdims=True)
    ref = np.array([0.0, 0.0, 1.0])
    n1 = np.cross(tang, ref)
    bad = np.linalg.norm(n1, axis=-1) < 1e-6
    n1[bad] = np.cross(tang[bad], [1.0, 0.0, 0.0])
    n1 /= np.linalg.norm(n1, axis=-1, keepdims=True)
    n2 = np.cross(tang, n1)

    a = np.linspace(0, 2 * np.pi, ring, endpoint=False)
    circ = (np.cos(a)[:, None, None] * n1[None]
            + np.sin(a)[:, None, None] * n2[None])       # (ring, S, 3)
    pts = c[None] + tube * circ                          # (ring, S, 3)
    pts = pts.transpose(1, 0, 2)                         # (S, ring, 3)

    i = np.arange(segs)[:, None]
    j = np.arange(ring)[None, :]
    i1 = (i + 1) % segs
    j1 = (j + 1) % ring
    v00 = pts[i, j]
    v10 = pts[i1, j]
    v01 = pts[i, j1]
    v11 = pts[i1, j1]
    tris = np.concatenate([
        np.stack([v00, v10, v11], 2).reshape(-1, 3, 3),
        np.stack([v00, v11, v01], 2).reshape(-1, 3, 3),
    ])
    return tris.astype(np.float32)


def menger_sponge(level=3) -> np.ndarray:
    """Level-``level`` Menger sponge in [-0.5, 0.5]^3 with interior shared
    faces culled (only visible faces become triangles)."""
    cells = {(0, 0, 0)}
    for _ in range(level):
        nxt = set()
        for (x, y, z) in cells:
            for dx in range(3):
                for dy in range(3):
                    for dz in range(3):
                        if (dx == 1) + (dy == 1) + (dz == 1) >= 2:
                            continue
                        nxt.add((3 * x + dx, 3 * y + dy, 3 * z + dz))
        cells = nxt
    n = 3 ** level
    s = 1.0 / n
    tris = []
    # face template: for each axis/dir the 4 corners (CCW outward)
    for (x, y, z) in cells:
        for axis in range(3):
            for d in (-1, 1):
                nb = [x, y, z]
                nb[axis] += d
                if tuple(nb) in cells:
                    continue  # shared face, interior
                lo = np.array([x, y, z], float) * s - 0.5
                hi = lo + s
                face = lo.copy()
                if d > 0:
                    face[axis] = hi[axis]
                u, v = (axis + 1) % 3, (axis + 2) % 3
                c00 = face.copy()
                c10 = face.copy(); c10[u] = hi[u]
                c01 = face.copy(); c01[v] = hi[v]
                c11 = face.copy(); c11[u] = hi[u]; c11[v] = hi[v]
                if d > 0:
                    tris.append([c00, c10, c11])
                    tris.append([c00, c11, c01])
                else:
                    tris.append([c00, c11, c10])
                    tris.append([c00, c01, c11])
    return np.asarray(tris, np.float32)


def main(outdir=None):
    sys.path.insert(0, os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))
    from c_raytracer_tpu.scene.stl import save_stl
    if outdir is None:
        outdir = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "assets", "meshes")
    os.makedirs(outdir, exist_ok=True)

    dragon = torus_knot()
    # scene5 places the dragon with scale 0.1 rot [1.57,0,0]; the Stanford
    # dragon STL spans ~tens of units — scale the knot up to that class
    dragon = dragon * np.float32(12.0)
    path = os.path.join(outdir, "dragon.stl")
    save_stl(path, dragon)
    print(f"{path}: {len(dragon)} triangles")

    sponge = menger_sponge(3)
    path = os.path.join(outdir, "menger_sponge.stl")
    save_stl(path, sponge)
    print(f"{path}: {len(sponge)} triangles")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else None)
