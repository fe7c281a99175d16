// BVH mesh ray-caster (first-hit depth).
//
// Native replacement for the reference's Open3D offscreen depth rendering
// in eval_recon (reference src/tools/eval_recon.py:131-210) and trimesh/
// pyembree ray tests in cull_mesh. Median-split BVH over triangles,
// Moller-Trumbore intersection, OpenMP-free (threads via caller batching).
//
// C API:
//   rc_handle* rc_build(const float* verts, long nv,
//                       const long* tris, long nt)
//   void rc_cast(rc_handle*, const float* origins, const float* dirs,
//                long n, float* t_out)   // t_out = -1 on miss
//   void rc_free(rc_handle*)

#include <algorithm>
#include <cfloat>
#include <cmath>
#include <cstdint>
#include <vector>

namespace {

struct V3 {
  float x, y, z;
};
inline V3 sub(V3 a, V3 b) { return {a.x - b.x, a.y - b.y, a.z - b.z}; }
inline V3 cross(V3 a, V3 b) {
  return {a.y * b.z - a.z * b.y, a.z * b.x - a.x * b.z,
          a.x * b.y - a.y * b.x};
}
inline float dot(V3 a, V3 b) { return a.x * b.x + a.y * b.y + a.z * b.z; }

struct AABB {
  V3 lo{FLT_MAX, FLT_MAX, FLT_MAX};
  V3 hi{-FLT_MAX, -FLT_MAX, -FLT_MAX};
  void grow(V3 p) {
    lo.x = std::min(lo.x, p.x); lo.y = std::min(lo.y, p.y);
    lo.z = std::min(lo.z, p.z);
    hi.x = std::max(hi.x, p.x); hi.y = std::max(hi.y, p.y);
    hi.z = std::max(hi.z, p.z);
  }
  void grow(const AABB& b) { grow(b.lo); grow(b.hi); }
};

struct Node {
  AABB box;
  int left = -1, right = -1;   // children, or
  int first = 0, count = 0;    // leaf triangle range
};

struct BVH {
  std::vector<V3> v0, e1, e2;      // per-triangle precomputed
  std::vector<AABB> tri_box;
  std::vector<V3> centroid;
  std::vector<int> order;          // triangle indices, leaf-contiguous
  std::vector<Node> nodes;

  int build(int first, int count) {
    Node node;
    for (int i = first; i < first + count; ++i)
      node.box.grow(tri_box[order[i]]);
    int idx = static_cast<int>(nodes.size());
    nodes.push_back(node);
    if (count <= 4) {
      nodes[idx].first = first;
      nodes[idx].count = count;
      return idx;
    }
    // split along the widest centroid axis at the median
    AABB cb;
    for (int i = first; i < first + count; ++i)
      cb.grow(centroid[order[i]]);
    float dx = cb.hi.x - cb.lo.x, dy = cb.hi.y - cb.lo.y,
          dz = cb.hi.z - cb.lo.z;
    int axis = (dx > dy && dx > dz) ? 0 : (dy > dz ? 1 : 2);
    int mid = first + count / 2;
    std::nth_element(order.begin() + first, order.begin() + mid,
                     order.begin() + first + count, [&](int a, int b) {
                       const V3& ca = centroid[a];
                       const V3& cbb = centroid[b];
                       return axis == 0   ? ca.x < cbb.x
                              : axis == 1 ? ca.y < cbb.y
                                          : ca.z < cbb.z;
                     });
    if (mid == first || mid == first + count) mid = first + count / 2;
    int l = build(first, mid - first);
    int r = build(mid, first + count - mid);
    nodes[idx].left = l;
    nodes[idx].right = r;
    nodes[idx].count = 0;
    return idx;
  }

  static bool hit_box(const AABB& b, V3 o, V3 inv_d, float tmax) {
    float t1 = (b.lo.x - o.x) * inv_d.x, t2 = (b.hi.x - o.x) * inv_d.x;
    float tmin = std::min(t1, t2), tM = std::max(t1, t2);
    t1 = (b.lo.y - o.y) * inv_d.y; t2 = (b.hi.y - o.y) * inv_d.y;
    tmin = std::max(tmin, std::min(t1, t2));
    tM = std::min(tM, std::max(t1, t2));
    t1 = (b.lo.z - o.z) * inv_d.z; t2 = (b.hi.z - o.z) * inv_d.z;
    tmin = std::max(tmin, std::min(t1, t2));
    tM = std::min(tM, std::max(t1, t2));
    return tM >= std::max(tmin, 0.0f) && tmin < tmax;
  }

  float cast(V3 o, V3 d) const {
    V3 inv_d{1.0f / (d.x == 0 ? 1e-30f : d.x),
             1.0f / (d.y == 0 ? 1e-30f : d.y),
             1.0f / (d.z == 0 ? 1e-30f : d.z)};
    float best = FLT_MAX;
    int stack[64];
    int sp = 0;
    stack[sp++] = 0;
    while (sp) {
      const Node& n = nodes[stack[--sp]];
      if (!hit_box(n.box, o, inv_d, best)) continue;
      if (n.count) {
        for (int i = n.first; i < n.first + n.count; ++i) {
          int t = order[i];
          // Moller-Trumbore
          V3 p = cross(d, e2[t]);
          float det = dot(e1[t], p);
          if (std::fabs(det) < 1e-12f) continue;
          float inv = 1.0f / det;
          V3 s = sub(o, v0[t]);
          float u = dot(s, p) * inv;
          if (u < 0.0f || u > 1.0f) continue;
          V3 q = cross(s, e1[t]);
          float v = dot(d, q) * inv;
          if (v < 0.0f || u + v > 1.0f) continue;
          float tt = dot(e2[t], q) * inv;
          if (tt > 1e-6f && tt < best) best = tt;
        }
      } else {
        stack[sp++] = n.left;
        stack[sp++] = n.right;
      }
    }
    return best == FLT_MAX ? -1.0f : best;
  }
};

}  // namespace

extern "C" {

struct rc_handle;

rc_handle* rc_build(const float* verts, long nv, const long* tris, long nt) {
  (void)nv;
  BVH* b = new BVH();
  b->v0.resize(nt);
  b->e1.resize(nt);
  b->e2.resize(nt);
  b->tri_box.resize(nt);
  b->centroid.resize(nt);
  b->order.resize(nt);
  for (long t = 0; t < nt; ++t) {
    V3 a{verts[3 * tris[3 * t] + 0], verts[3 * tris[3 * t] + 1],
         verts[3 * tris[3 * t] + 2]};
    V3 bb{verts[3 * tris[3 * t + 1] + 0], verts[3 * tris[3 * t + 1] + 1],
          verts[3 * tris[3 * t + 1] + 2]};
    V3 c{verts[3 * tris[3 * t + 2] + 0], verts[3 * tris[3 * t + 2] + 1],
         verts[3 * tris[3 * t + 2] + 2]};
    b->v0[t] = a;
    b->e1[t] = sub(bb, a);
    b->e2[t] = sub(c, a);
    b->tri_box[t].grow(a);
    b->tri_box[t].grow(bb);
    b->tri_box[t].grow(c);
    b->centroid[t] = {(a.x + bb.x + c.x) / 3, (a.y + bb.y + c.y) / 3,
                      (a.z + bb.z + c.z) / 3};
    b->order[t] = static_cast<int>(t);
  }
  if (nt > 0) b->build(0, static_cast<int>(nt));
  return reinterpret_cast<rc_handle*>(b);
}

void rc_cast(rc_handle* h, const float* origins, const float* dirs, long n,
             float* t_out) {
  BVH* b = reinterpret_cast<BVH*>(h);
  for (long i = 0; i < n; ++i) {
    V3 o{origins[3 * i], origins[3 * i + 1], origins[3 * i + 2]};
    V3 d{dirs[3 * i], dirs[3 * i + 1], dirs[3 * i + 2]};
    t_out[i] = b->nodes.empty() ? -1.0f : b->cast(o, d);
  }
}

void rc_free(rc_handle* h) { delete reinterpret_cast<BVH*>(h); }

}  // extern "C"
