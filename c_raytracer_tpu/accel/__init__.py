"""Acceleration structures: host-side Morton/LBVH build (native C++ with a
NumPy fallback) and TPU-native cluster-sweep traversal (SURVEY.md §2.3
"BVH acceleration" row; reference accel.c)."""

from c_raytracer_tpu.accel.build import morton_order, reorder_scene
from c_raytracer_tpu.accel.intersect import Intersector, make_intersector
from c_raytracer_tpu.accel.traverse import ClusterSet, pack_clusters

__all__ = ["morton_order", "reorder_scene", "Intersector",
           "make_intersector", "ClusterSet", "pack_clusters"]
