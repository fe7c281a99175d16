// Level-set surface extraction by marching tetrahedra.
//
// Native replacement for the reference's skimage.measure.marching_cubes
// (reference src/utils/Mesher.py:437-458). Each grid cube is split into 6
// tetrahedra; each tet contributes 0-2 triangles depending on the sign
// pattern of (value - level) at its 4 corners, with vertices linearly
// interpolated along crossing edges. Table-free by construction (the 16 tet
// cases enumerate directly), watertight across shared faces.
//
// C API (ctypes-friendly):
//   mt_handle* mt_extract(const float* grid, int nx, int ny, int nz,
//                         float level)   -- grid indexed grid[(x*ny+y)*nz+z]
//   long mt_num_vertices(mt_handle*)
//   long mt_num_triangles(mt_handle*)
//   void mt_copy(mt_handle*, float* verts /*(V,3)*/, long* tris /*(T,3)*/)
//   void mt_free(mt_handle*)
//
// Vertices are emitted in grid-index coordinates (x, y, z in [0, n-1]);
// the Python side maps them into world coordinates. Shared vertices are
// deduplicated via an edge-key hash map so the mesh is connected.

#include <cstdint>
#include <cstring>
#include <unordered_map>
#include <vector>

namespace {

struct V3 {
  float x, y, z;
};

struct Mesh {
  std::vector<V3> verts;
  std::vector<long> tris;  // flat, 3 per triangle
  std::unordered_map<uint64_t, long> edge_cache;
};

// The 6-tetrahedra decomposition of a unit cube (corner indices 0..7 with
// corner c = (x + (c&1), y + ((c>>1)&1), z + ((c>>2)&1))). All tets share
// the main diagonal 0-7, which makes neighboring cubes stitch seamlessly.
const int kTets[6][4] = {
    {0, 5, 1, 7}, {0, 1, 3, 7}, {0, 3, 2, 7},
    {0, 2, 6, 7}, {0, 6, 4, 7}, {0, 4, 5, 7},
};

inline uint64_t edge_key(long a, long b) {
  if (a > b) std::swap(a, b);
  return (static_cast<uint64_t>(a) << 32) | static_cast<uint64_t>(b);
}

}  // namespace

extern "C" {

struct mt_handle;

mt_handle* mt_extract(const float* grid, int nx, int ny, int nz,
                      float level) {
  Mesh* mesh = new Mesh();
  auto value = [&](long x, long y, long z) -> float {
    return grid[(x * ny + y) * (long)nz + z];
  };
  auto corner_id = [&](long x, long y, long z) -> long {
    return (x * ny + y) * (long)nz + z;
  };

  // interpolated vertex on the edge between two grid corners
  auto edge_vertex = [&](long ax, long ay, long az, float av, long bx,
                         long by, long bz, float bv) -> long {
    uint64_t key = edge_key(corner_id(ax, ay, az), corner_id(bx, by, bz));
    auto it = mesh->edge_cache.find(key);
    if (it != mesh->edge_cache.end()) return it->second;
    float denom = bv - av;
    float t = (denom == 0.0f) ? 0.5f : (level - av) / denom;
    if (t < 0.0f) t = 0.0f;
    if (t > 1.0f) t = 1.0f;
    V3 v{ax + t * (bx - ax), ay + t * (by - ay), az + t * (bz - az)};
    long idx = static_cast<long>(mesh->verts.size());
    mesh->verts.push_back(v);
    mesh->edge_cache.emplace(key, idx);
    return idx;
  };

  long cx[4], cy[4], cz[4];
  float cv[4];

  for (long x = 0; x + 1 < nx; ++x) {
    for (long y = 0; y + 1 < ny; ++y) {
      for (long z = 0; z + 1 < nz; ++z) {
        // skip cubes with no crossing (fast path)
        bool any_in = false, any_out = false;
        for (int c = 0; c < 8; ++c) {
          float v = value(x + (c & 1), y + ((c >> 1) & 1), z + ((c >> 2) & 1));
          (v < level ? any_in : any_out) = true;
        }
        if (!any_in || !any_out) continue;

        for (const auto& tet : kTets) {
          int inside_n = 0;
          int inside[4], outside[4];
          for (int i = 0; i < 4; ++i) {
            int c = tet[i];
            cx[i] = x + (c & 1);
            cy[i] = y + ((c >> 1) & 1);
            cz[i] = z + ((c >> 2) & 1);
            cv[i] = value(cx[i], cy[i], cz[i]);
          }
          for (int i = 0; i < 4; ++i) {
            if (cv[i] < level) inside[inside_n++] = i;
          }
          if (inside_n == 0 || inside_n == 4) continue;
          int outside_n = 0;
          for (int i = 0; i < 4; ++i) {
            bool is_in = false;
            for (int j = 0; j < inside_n; ++j) is_in |= (inside[j] == i);
            if (!is_in) outside[outside_n++] = i;
          }

          auto ev = [&](int i, int o) {
            return edge_vertex(cx[i], cy[i], cz[i], cv[i], cx[o], cy[o],
                               cz[o], cv[o]);
          };

          if (inside_n == 1) {  // one triangle
            int i = inside[0];
            long a = ev(i, outside[0]);
            long b = ev(i, outside[1]);
            long c = ev(i, outside[2]);
            mesh->tris.insert(mesh->tris.end(), {a, b, c});
          } else if (inside_n == 3) {  // one triangle (flipped)
            int o = outside[0];
            long a = ev(inside[0], o);
            long b = ev(inside[1], o);
            long c = ev(inside[2], o);
            mesh->tris.insert(mesh->tris.end(), {a, c, b});
          } else {  // inside_n == 2: quad -> two triangles
            int i0 = inside[0], i1 = inside[1];
            int o0 = outside[0], o1 = outside[1];
            long a = ev(i0, o0);
            long b = ev(i0, o1);
            long c = ev(i1, o1);
            long d = ev(i1, o0);
            mesh->tris.insert(mesh->tris.end(), {a, b, c});
            mesh->tris.insert(mesh->tris.end(), {a, c, d});
          }
        }
      }
    }
  }
  return reinterpret_cast<mt_handle*>(mesh);
}

long mt_num_vertices(mt_handle* h) {
  return static_cast<long>(reinterpret_cast<Mesh*>(h)->verts.size());
}

long mt_num_triangles(mt_handle* h) {
  return static_cast<long>(reinterpret_cast<Mesh*>(h)->tris.size() / 3);
}

void mt_copy(mt_handle* h, float* verts, long* tris) {
  Mesh* mesh = reinterpret_cast<Mesh*>(h);
  std::memcpy(verts, mesh->verts.data(), mesh->verts.size() * sizeof(V3));
  std::memcpy(tris, mesh->tris.data(), mesh->tris.size() * sizeof(long));
}

void mt_free(mt_handle* h) { delete reinterpret_cast<Mesh*>(h); }

}  // extern "C"
