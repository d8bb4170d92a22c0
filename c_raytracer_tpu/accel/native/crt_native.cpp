// Native host-side acceleration-structure builder.
//
// The reference builds its LBVH on the host in C (accel.c:266-315): Morton
// codes of AABB centroids normalized to the scene extents (accel.c:72-88,
// 290-308), a qsort by code (accel.c:310), and recursive highest-differing-
// bit splits (accel.c:226-264).  This is the TPU framework's equivalent
// native runtime component: it produces the Morton-sorted primitive order
// and cluster ranges that the device-side sweep traversal
// (c_raytracer_tpu/accel/traverse.py) consumes.  A NumPy fallback with
// identical semantics lives in c_raytracer_tpu/accel/build.py.
//
// Also provides a binary-STL triangle reader (the reference parses STL in
// object.c:521-587) so mesh loading is native end-to-end.
//
// Build: g++ -O3 -shared -fPIC -o libcrt_native.so crt_native.cpp

#include <algorithm>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

extern "C" {

// Spread the low 10 bits of v so there are 2 zero bits between each
// (the reference's expand_bits, accel.c:72-80).
static inline uint32_t expand_bits(uint32_t v) {
  v = (v * 0x00010001u) & 0xFF0000FFu;
  v = (v * 0x00000101u) & 0x0F00F00Fu;
  v = (v * 0x00000011u) & 0xC30C30C3u;
  v = (v * 0x00000005u) & 0x49249249u;
  return v;
}

// 30-bit Morton code of a point in [0,1]^3 (accel.c:82-88).
static inline uint32_t morton3(float x, float y, float z) {
  auto q = [](float f) {
    f = f * 1024.0f;
    if (f < 0.0f) f = 0.0f;
    if (f > 1023.0f) f = 1023.0f;
    return (uint32_t)f;
  };
  return (expand_bits(q(x)) << 2) | (expand_bits(q(y)) << 1) | expand_bits(q(z));
}

// Morton-sort n points (centroids, row-major n x 3).  Writes the permutation
// (indices into the input, sorted by Morton code, ties by index — matching a
// stable sort of the reference's qsort input) to out_perm and the codes (in
// input order) to out_codes (may be null).
void crt_morton_sort(const float* centroids, int64_t n,
                     uint32_t* out_perm, uint32_t* out_codes) {
  if (n <= 0) return;
  float lo[3], hi[3];
  for (int a = 0; a < 3; ++a) lo[a] = hi[a] = centroids[a];
  for (int64_t i = 1; i < n; ++i)
    for (int a = 0; a < 3; ++a) {
      float v = centroids[i * 3 + a];
      if (v < lo[a]) lo[a] = v;
      if (v > hi[a]) hi[a] = v;
    }
  float inv[3];
  for (int a = 0; a < 3; ++a) {
    float d = hi[a] - lo[a];
    inv[a] = d > 0.0f ? 1.0f / d : 0.0f;
  }
  std::vector<uint32_t> codes(n);
  for (int64_t i = 0; i < n; ++i)
    codes[i] = morton3((centroids[i * 3 + 0] - lo[0]) * inv[0],
                       (centroids[i * 3 + 1] - lo[1]) * inv[1],
                       (centroids[i * 3 + 2] - lo[2]) * inv[2]);
  std::vector<uint32_t> perm(n);
  for (int64_t i = 0; i < n; ++i) perm[i] = (uint32_t)i;
  std::stable_sort(perm.begin(), perm.end(),
                   [&](uint32_t a, uint32_t b) { return codes[a] < codes[b]; });
  std::memcpy(out_perm, perm.data(), n * sizeof(uint32_t));
  if (out_codes) std::memcpy(out_codes, codes.data(), n * sizeof(uint32_t));
}

// LBVH internal-node ranges over a Morton-sorted leaf array, split at the
// highest differing bit (the reference's bvh_generate_node, accel.c:226-264,
// adapted from the NVIDIA "Thinking Parallel" series).  Emits, for each
// internal node in preorder, [first, last, split] into out_ranges (3 per
// node); returns the node count.  Used for validation and for building
// shallow cluster hierarchies; the device traversal consumes fixed-size
// clusters of the sorted order, so this is reference/CPU-side metadata.
static void lbvh_ranges(const uint32_t* codes, int64_t first, int64_t last,
                        std::vector<int64_t>& out) {
  if (first >= last) return;
  uint32_t cf = codes[first], cl = codes[last];
  int64_t split;
  if (cf == cl) {
    split = (first + last) / 2;  // accel.c:238-241
  } else {
    // binary search for the last index sharing the common prefix
    // (accel.c:243-255)
    int common = __builtin_clz(cf ^ cl);
    split = first;
    int64_t step = last - first;
    do {
      step = (step + 1) >> 1;
      int64_t nsplit = split + step;
      if (nsplit < last) {
        int prefix = __builtin_clz(cf ^ codes[nsplit]);
        if (prefix > common) split = nsplit;
      }
    } while (step > 1);
  }
  out.push_back(first);
  out.push_back(last);
  out.push_back(split);
  lbvh_ranges(codes, first, split, out);
  lbvh_ranges(codes, split + 1, last, out);
}

// codes must be sorted ascending.  out_ranges must hold 3*(n-1) entries.
int64_t crt_lbvh_ranges(const uint32_t* sorted_codes, int64_t n,
                        int64_t* out_ranges) {
  if (n <= 1) return 0;
  std::vector<int64_t> out;
  out.reserve(3 * (n - 1));
  lbvh_ranges(sorted_codes, 0, n - 1, out);
  std::memcpy(out_ranges, out.data(), out.size() * sizeof(int64_t));
  return (int64_t)(out.size() / 3);
}

// Binary STL reader (layout: 80-byte header, uint32 count, then per
// triangle 12 floats + uint16 attr; object.c:531-545).  Returns the
// triangle count, or -1 on error / ASCII file (rejected like
// object.c:546-548).  vertices_out: count*9 floats (3 vertices each);
// pass null to query the count first.
int64_t crt_stl_read(const char* path, float* vertices_out,
                     int64_t max_triangles) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  char header[80];
  if (fread(header, 1, 80, f) != 80) { fclose(f); return -1; }
  if (std::strncmp(header, "solid", 5) == 0) { fclose(f); return -1; }
  uint32_t count = 0;
  if (fread(&count, 4, 1, f) != 1) { fclose(f); return -1; }
  if (!vertices_out) { fclose(f); return (int64_t)count; }
  if ((int64_t)count > max_triangles) { fclose(f); return -1; }
  for (uint32_t i = 0; i < count; ++i) {
    float rec[12];
    uint16_t attr;
    if (fread(rec, 4, 12, f) != 12 || fread(&attr, 2, 1, f) != 1) {
      fclose(f);
      return -1;
    }
    // rec[0..2] is the file normal (recomputed by the loader, like
    // triangle_new does from the vertices); rec[3..11] are the vertices.
    std::memcpy(vertices_out + i * 9, rec + 3, 9 * sizeof(float));
  }
  fclose(f);
  return (int64_t)count;
}

}  // extern "C"
