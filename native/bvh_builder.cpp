// Native sweep-SAH BVH builder.
//
// Drop-in accelerated equivalent of the NumPy builder in
// metalpathtracer_tpu/accel/bvh.py (same algorithm family as the reference's
// host builder, `MetalCpp Path Tracer/Scene/Scene.h:195-317`: top-down
// full-sweep surface-area heuristic, <= leaf_size primitives per leaf,
// leftFirst/±count node encoding). The Python builder is fine at bunny scale;
// this one keeps scene (re)builds interactive at millions of primitives —
// the role the reference's C++ builder plays on its side.
//
// C ABI (loaded via ctypes from metalpathtracer_tpu/accel/native.py):
//   int mpt_build_bvh(const float* lo, const float* hi, int n, int leaf_size,
//                     float* node_lo, float* node_hi,
//                     int* node_a, int* node_b, int* prim_indices);
// node arrays must hold 2n nodes; returns the node count (or -1 on error).
//
// Build: make -C native   (produces native/libmptbvh.so)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <limits>
#include <vector>

namespace {

struct Vec3 {
  float x, y, z;
};

inline Vec3 vmin(const Vec3& a, const Vec3& b) {
  return {std::min(a.x, b.x), std::min(a.y, b.y), std::min(a.z, b.z)};
}
inline Vec3 vmax(const Vec3& a, const Vec3& b) {
  return {std::max(a.x, b.x), std::max(a.y, b.y), std::max(a.z, b.z)};
}

inline float surface_area(const Vec3& lo, const Vec3& hi) {
  const float dx = std::max(hi.x - lo.x, 0.0f);
  const float dy = std::max(hi.y - lo.y, 0.0f);
  const float dz = std::max(hi.z - lo.z, 0.0f);
  return 2.0f * (dx * dy + dy * dz + dz * dx);
}

constexpr float kTraversalCost = 0.125f;  // reference Scene.h:283-299

struct Builder {
  const Vec3* lo;
  const Vec3* hi;
  std::vector<Vec3> centroid;
  std::vector<int32_t> indices;
  // scratch for sweeps (reused across nodes)
  std::vector<Vec3> suffix_lo, suffix_hi;
  std::vector<int32_t> scratch;

  float* node_lo;
  float* node_hi;
  int32_t* node_a;
  int32_t* node_b;
  int32_t num_nodes = 0;
  int32_t max_nodes;
  int leaf_size;

  // Returns {axis, k} of the best SAH split of indices[start,end), or
  // k == 0 for "make a leaf".
  std::pair<int, int> best_split(int start, int end) {
    const int count = end - start;
    Vec3 plo = lo[indices[start]], phi = hi[indices[start]];
    for (int i = start + 1; i < end; ++i) {
      plo = vmin(plo, lo[indices[i]]);
      phi = vmax(phi, hi[indices[i]]);
    }
    const float parent_sa = surface_area(plo, phi);
    if (!(parent_sa > 0.0f) || !std::isfinite(parent_sa)) return {0, 0};

    float best_cost = std::numeric_limits<float>::infinity();
    int best_axis = -1, best_k = 0;
    suffix_lo.resize(count);
    suffix_hi.resize(count);
    scratch.assign(indices.begin() + start, indices.begin() + end);

    for (int axis = 0; axis < 3; ++axis) {
      std::stable_sort(scratch.begin(), scratch.end(),
                       [&](int32_t a, int32_t b) {
                         const float ca = axis == 0   ? centroid[a].x
                                          : axis == 1 ? centroid[a].y
                                                      : centroid[a].z;
                         const float cb = axis == 0   ? centroid[b].x
                                          : axis == 1 ? centroid[b].y
                                                      : centroid[b].z;
                         return ca < cb;
                       });
      // suffix AABBs of [i, count)
      Vec3 rlo = lo[scratch[count - 1]], rhi = hi[scratch[count - 1]];
      for (int i = count - 1; i >= 0; --i) {
        rlo = vmin(rlo, lo[scratch[i]]);
        rhi = vmax(rhi, hi[scratch[i]]);
        suffix_lo[i] = rlo;
        suffix_hi[i] = rhi;
      }
      // prefix sweep, evaluating cost at every split k = 1..count-1
      Vec3 llo = lo[scratch[0]], lhi = hi[scratch[0]];
      for (int k = 1; k < count; ++k) {
        const float sa_l = surface_area(llo, lhi);
        const float sa_r = surface_area(suffix_lo[k], suffix_hi[k]);
        const float cost =
            kTraversalCost + (sa_l * k + sa_r * (count - k)) / parent_sa;
        if (cost < best_cost) {
          best_cost = cost;
          best_axis = axis;
          best_k = k;
        }
        llo = vmin(llo, lo[scratch[k]]);
        lhi = vmax(lhi, hi[scratch[k]]);
      }
    }
    if (best_axis < 0) return {0, 0};
    if (best_k == 0 || best_k == count) best_k = count / 2;  // degenerate
    return {best_axis, best_k};
  }

  void build(int node, int start, int end) {
    const int count = end - start;
    Vec3 blo = lo[indices[start]], bhi = hi[indices[start]];
    for (int i = start + 1; i < end; ++i) {
      blo = vmin(blo, lo[indices[i]]);
      bhi = vmax(bhi, hi[indices[i]]);
    }
    node_lo[3 * node + 0] = blo.x;
    node_lo[3 * node + 1] = blo.y;
    node_lo[3 * node + 2] = blo.z;
    node_hi[3 * node + 0] = bhi.x;
    node_hi[3 * node + 1] = bhi.y;
    node_hi[3 * node + 2] = bhi.z;

    int axis = 0, k = 0;
    if (count > leaf_size) {
      auto split = best_split(start, end);
      axis = split.first;
      k = split.second;
      // degenerate SAH (zero/invalid surface area): force a median split —
      // leaves must stay <= leaf_size or traversal silently drops hits
      if (k == 0) k = count / 2;
    }
    if (k == 0) {  // leaf
      node_a[node] = start;
      node_b[node] = count;
      return;
    }

    std::stable_sort(indices.begin() + start, indices.begin() + end,
                     [&](int32_t a, int32_t b) {
                       const float ca = axis == 0   ? centroid[a].x
                                        : axis == 1 ? centroid[a].y
                                                    : centroid[a].z;
                       const float cb = axis == 0   ? centroid[b].x
                                        : axis == 1 ? centroid[b].y
                                                    : centroid[b].z;
                       return ca < cb;
                     });
    const int left = num_nodes++;
    const int right = num_nodes++;
    node_a[node] = left;
    node_b[node] = -right;
    build(left, start, start + k);
    build(right, start + k, end);
  }
};

}  // namespace

extern "C" int mpt_build_bvh(const float* lo, const float* hi, int n,
                             int leaf_size, float* node_lo, float* node_hi,
                             int* node_a, int* node_b, int* prim_indices) {
  if (n <= 0 || leaf_size <= 0) return -1;
  Builder b;
  b.lo = reinterpret_cast<const Vec3*>(lo);
  b.hi = reinterpret_cast<const Vec3*>(hi);
  b.centroid.resize(n);
  for (int i = 0; i < n; ++i) {
    b.centroid[i] = {0.5f * (b.lo[i].x + b.hi[i].x),
                     0.5f * (b.lo[i].y + b.hi[i].y),
                     0.5f * (b.lo[i].z + b.hi[i].z)};
  }
  b.indices.resize(n);
  for (int i = 0; i < n; ++i) b.indices[i] = i;
  b.node_lo = node_lo;
  b.node_hi = node_hi;
  b.node_a = node_a;
  b.node_b = node_b;
  b.max_nodes = 2 * n;
  b.leaf_size = leaf_size;
  b.num_nodes = 1;
  b.build(0, 0, n);
  std::copy(b.indices.begin(), b.indices.end(), prim_indices);
  return b.num_nodes;
}

extern "C" int mpt_abi_version() { return 1; }
