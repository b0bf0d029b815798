// Binned-SAH BVH builder (native host component).
//
// TPU-framework equivalent of the reference's CPU SAH builder
// (CLBVHScene::RecursiveBuild, CLBVHnode.cpp:7-159), written fresh for a
// different output contract: instead of emitting a flattened node array
// for a per-ray traversal stack, it emits a depth-first *triangle
// ordering* plus leaf ranges. The TPU cluster kernel
// (ops/pallas/clustered.py) packs those leaves into fixed-size cluster
// blocks — SAH leaves are spatially much tighter than Morton-range
// clusters, so packets visit fewer of them.
//
// Exposed via a plain C ABI for ctypes (no pybind11 in this image).

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct Vec3 {
  float x, y, z;
};

static inline Vec3 vmin(const Vec3& a, const Vec3& b) {
  return {std::min(a.x, b.x), std::min(a.y, b.y), std::min(a.z, b.z)};
}
static inline Vec3 vmax(const Vec3& a, const Vec3& b) {
  return {std::max(a.x, b.x), std::max(a.y, b.y), std::max(a.z, b.z)};
}

struct Bounds {
  Vec3 lo{3e38f, 3e38f, 3e38f};
  Vec3 hi{-3e38f, -3e38f, -3e38f};
  void grow(const Vec3& p) {
    lo = vmin(lo, p);
    hi = vmax(hi, p);
  }
  void grow(const Bounds& b) {
    lo = vmin(lo, b.lo);
    hi = vmax(hi, b.hi);
  }
  float area() const {
    float dx = std::max(hi.x - lo.x, 0.f);
    float dy = std::max(hi.y - lo.y, 0.f);
    float dz = std::max(hi.z - lo.z, 0.f);
    return 2.f * (dx * dy + dy * dz + dz * dx);
  }
  Vec3 centroid() const {
    return {0.5f * (lo.x + hi.x), 0.5f * (lo.y + hi.y), 0.5f * (lo.z + hi.z)};
  }
};

struct Prim {
  Bounds b;
  Vec3 c;
  int idx;
};

constexpr int kBins = 16;

struct Builder {
  std::vector<Prim> prims;
  std::vector<int32_t> order;
  std::vector<int32_t> leaf_starts;  // start offset of each leaf in order
  std::vector<int32_t> leaf_counts;
  int leaf_size;

  // Recursive binned-SAH split over prims[lo, hi).
  void build(int lo, int hi) {
    int n = hi - lo;
    Bounds cb;  // centroid bounds
    for (int i = lo; i < hi; ++i) cb.grow(prims[i].c);

    bool degenerate =
        (cb.hi.x - cb.lo.x) <= 0.f && (cb.hi.y - cb.lo.y) <= 0.f &&
        (cb.hi.z - cb.lo.z) <= 0.f;
    if (n <= leaf_size || degenerate) {
      emit_leaf(lo, hi);
      return;
    }

    // Pick the centroid-extent axis (reference heuristic,
    // CLBVHnode.cpp:41-46) and the best binned SAH split on it.
    float ex = cb.hi.x - cb.lo.x, ey = cb.hi.y - cb.lo.y,
          ez = cb.hi.z - cb.lo.z;
    int axis = ex > ey ? (ex > ez ? 0 : 2) : (ey > ez ? 1 : 2);
    float cmin = axis == 0 ? cb.lo.x : axis == 1 ? cb.lo.y : cb.lo.z;
    float cext = axis == 0 ? ex : axis == 1 ? ey : ez;
    float inv = kBins / cext;

    Bounds bin_b[kBins];
    int bin_n[kBins] = {0};
    for (int i = lo; i < hi; ++i) {
      float c = axis == 0 ? prims[i].c.x
                          : axis == 1 ? prims[i].c.y : prims[i].c.z;
      int b = std::min(int((c - cmin) * inv), kBins - 1);
      bin_b[b].grow(prims[i].b);
      bin_n[b]++;
    }

    // Sweep for the minimum-cost partition (cost model as
    // CLBVHnode.cpp:91-119: Csplit = 0.125 + (nL*aL + nR*aR)/aRoot).
    Bounds right_acc[kBins];
    Bounds acc;
    for (int b = kBins - 1; b > 0; --b) {
      acc.grow(bin_b[b]);
      right_acc[b] = acc;
    }
    Bounds left_acc;
    int left_n = 0;
    float best_cost = 3e38f;
    int best_split = -1;
    Bounds total;
    for (int b = 0; b < kBins; ++b) total.grow(bin_b[b]);
    float inv_area = 1.f / std::max(total.area(), 1e-20f);
    for (int b = 0; b < kBins - 1; ++b) {
      left_acc.grow(bin_b[b]);
      left_n += bin_n[b];
      int right_n = n - left_n;
      if (left_n == 0 || right_n == 0) continue;
      float cost = 0.125f + (left_n * left_acc.area() +
                             right_n * right_acc[b + 1].area()) * inv_area;
      if (cost < best_cost) {
        best_cost = cost;
        best_split = b;
      }
    }

    if (best_split < 0) {  // all centroids in one bin: median split
      int mid = lo + n / 2;
      std::nth_element(prims.begin() + lo, prims.begin() + mid,
                       prims.begin() + hi, [axis](const Prim& a,
                                                  const Prim& b) {
                         return axis == 0 ? a.c.x < b.c.x
                                : axis == 1 ? a.c.y < b.c.y : a.c.z < b.c.z;
                       });
      build(lo, mid);
      build(mid, hi);
      return;
    }

    auto mid_it = std::partition(
        prims.begin() + lo, prims.begin() + hi, [&](const Prim& p) {
          float c = axis == 0 ? p.c.x : axis == 1 ? p.c.y : p.c.z;
          return int(std::min((c - cmin) * inv, float(kBins - 1))) <=
                 best_split;
        });
    int mid = int(mid_it - prims.begin());
    if (mid == lo || mid == hi) mid = lo + n / 2;  // safety
    build(lo, mid);
    build(mid, hi);
  }

  void emit_leaf(int lo, int hi) {
    leaf_starts.push_back(int32_t(order.size()));
    leaf_counts.push_back(int32_t(hi - lo));
    for (int i = lo; i < hi; ++i) order.push_back(prims[i].idx);
  }
};

}  // namespace

extern "C" {

// Build a SAH tree over T triangles; writes the depth-first triangle
// ordering into order_out[T] and leaf (start,count) pairs into
// leaf_starts_out / leaf_counts_out (capacity max_leaves each).
// Returns the number of leaves, or -1 if max_leaves is too small.
int sah_build(int T, const float* v0, const float* v1, const float* v2,
              int leaf_size, int32_t* order_out, int32_t* leaf_starts_out,
              int32_t* leaf_counts_out, int max_leaves) {
  if (T <= 0) return 0;
  Builder b;
  b.leaf_size = std::max(leaf_size, 1);
  b.prims.resize(T);
  for (int i = 0; i < T; ++i) {
    Vec3 a{v0[3 * i], v0[3 * i + 1], v0[3 * i + 2]};
    Vec3 c{v1[3 * i], v1[3 * i + 1], v1[3 * i + 2]};
    Vec3 d{v2[3 * i], v2[3 * i + 1], v2[3 * i + 2]};
    Bounds bb;
    bb.grow(a);
    bb.grow(c);
    bb.grow(d);
    b.prims[i] = {bb, bb.centroid(), i};
  }
  b.order.reserve(T);
  b.build(0, T);

  int L = int(b.leaf_starts.size());
  if (L > max_leaves) return -1;
  std::memcpy(order_out, b.order.data(), sizeof(int32_t) * T);
  std::memcpy(leaf_starts_out, b.leaf_starts.data(), sizeof(int32_t) * L);
  std::memcpy(leaf_counts_out, b.leaf_counts.data(), sizeof(int32_t) * L);
  return L;
}

}  // extern "C"
