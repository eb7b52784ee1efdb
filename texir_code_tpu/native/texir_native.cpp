// Native host-side engines: BVH build + texture-space geometry baking.
//
// The reference's native layer is external C++/CUDA (Embree BVH inside
// Open3D, nvdiffrast's rasterizer).  This framework keeps ray traversal on
// the TPU, but the *host-side scene preparation* is genuinely hot for scan
// meshes (hundreds of thousands of triangles):
//
//   * build_bvh       — binned-SAH skip-link BVH, same array contract as
//                       geometry/bvh.py::build_bvh (the Python builder
//                       remains the fallback and the reference oracle).
//   * bake_geometry   — texture-space rasterization of per-texel world
//                       position/normal (models/tracer_irt.py's
//                       bake_geometry_textures fallback).
//
// Plain C ABI for ctypes; no Python headers needed.
//
// Build: g++ -O3 -march=native -shared -fPIC texir_native.cpp -o libtexir_native.so

#include <algorithm>
#include <cmath>
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

struct BuildNode {
  Vec3 bmin, bmax;
  int left = -1, right = -1;     // children (build ids)
  std::vector<int> tris;         // leaf triangles
};

struct Builder {
  int leaf_width;
  const float* verts;
  const int32_t* faces;
  std::vector<Vec3> cmin, cmax, cent;
  std::vector<BuildNode> nodes;

  Vec3 corner(int f, int c) const {
    const int32_t vi = faces[3 * f + c];
    return {verts[3 * vi], verts[3 * vi + 1], verts[3 * vi + 2]};
  }

  int make_node(const std::vector<int>& idx) {
    BuildNode n;
    n.bmin = {1e30f, 1e30f, 1e30f};
    n.bmax = {-1e30f, -1e30f, -1e30f};
    for (int t : idx) {
      n.bmin = vmin(n.bmin, cmin[t]);
      n.bmax = vmax(n.bmax, cmax[t]);
    }
    nodes.push_back(std::move(n));
    return (int)nodes.size() - 1;
  }

  static float half_area(const Vec3& lo, const Vec3& hi) {
    const float dx = std::max(hi.x - lo.x, 0.f);
    const float dy = std::max(hi.y - lo.y, 0.f);
    const float dz = std::max(hi.z - lo.z, 0.f);
    return dx * dy + dy * dz + dz * dx;
  }

  // binned SAH split; falls back to median when degenerate
  bool split(const std::vector<int>& idx, std::vector<int>& left,
             std::vector<int>& right) {
    constexpr int kBins = 16;
    Vec3 clo = {1e30f, 1e30f, 1e30f}, chi = {-1e30f, -1e30f, -1e30f};
    for (int t : idx) {
      clo = vmin(clo, cent[t]);
      chi = vmax(chi, cent[t]);
    }
    const float ext[3] = {chi.x - clo.x, chi.y - clo.y, chi.z - clo.z};
    int axis = 0;
    if (ext[1] > ext[axis]) axis = 1;
    if (ext[2] > ext[axis]) axis = 2;
    const float lo = axis == 0 ? clo.x : axis == 1 ? clo.y : clo.z;
    const float extent = ext[axis];
    if (extent <= 1e-12f) {
      // median fallback on an arbitrary stable order
      std::vector<int> sorted(idx);
      std::nth_element(sorted.begin(), sorted.begin() + sorted.size() / 2,
                       sorted.end());
      left.assign(sorted.begin(), sorted.begin() + sorted.size() / 2);
      right.assign(sorted.begin() + sorted.size() / 2, sorted.end());
      return !left.empty() && !right.empty();
    }
    const float scale = kBins * (1.0f - 1e-6f) / extent;
    int counts[kBins] = {0};
    Vec3 bmin[kBins], bmax[kBins];
    for (int b = 0; b < kBins; ++b) {
      bmin[b] = {1e30f, 1e30f, 1e30f};
      bmax[b] = {-1e30f, -1e30f, -1e30f};
    }
    auto bin_of = [&](int t) {
      const float c = axis == 0 ? cent[t].x : axis == 1 ? cent[t].y : cent[t].z;
      int b = (int)((c - lo) * scale);
      return std::min(std::max(b, 0), kBins - 1);
    };
    for (int t : idx) {
      const int b = bin_of(t);
      counts[b]++;
      bmin[b] = vmin(bmin[b], cmin[t]);
      bmax[b] = vmax(bmax[b], cmax[t]);
    }
    // prefix/suffix sweeps
    float larea[kBins], rarea[kBins];
    int lcount[kBins], rcount[kBins];
    Vec3 accmin = {1e30f, 1e30f, 1e30f}, accmax = {-1e30f, -1e30f, -1e30f};
    int acc = 0;
    for (int b = 0; b < kBins; ++b) {
      accmin = vmin(accmin, bmin[b]);
      accmax = vmax(accmax, bmax[b]);
      acc += counts[b];
      larea[b] = half_area(accmin, accmax);
      lcount[b] = acc;
    }
    accmin = {1e30f, 1e30f, 1e30f};
    accmax = {-1e30f, -1e30f, -1e30f};
    acc = 0;
    for (int b = kBins - 1; b >= 0; --b) {
      accmin = vmin(accmin, bmin[b]);
      accmax = vmax(accmax, bmax[b]);
      acc += counts[b];
      rarea[b] = half_area(accmin, accmax);
      rcount[b] = acc;
    }
    float best = 1e30f;
    int best_b = -1;
    for (int b = 0; b < kBins - 1; ++b) {
      if (lcount[b] == 0 || rcount[b + 1] == 0) continue;
      const float cost = larea[b] * lcount[b] + rarea[b + 1] * rcount[b + 1];
      if (cost < best) {
        best = cost;
        best_b = b;
      }
    }
    if (best_b < 0) {
      std::vector<int> sorted(idx);
      std::sort(sorted.begin(), sorted.end(), [&](int a, int b2) {
        const float ca = axis == 0 ? cent[a].x : axis == 1 ? cent[a].y : cent[a].z;
        const float cb = axis == 0 ? cent[b2].x : axis == 1 ? cent[b2].y : cent[b2].z;
        return ca < cb;
      });
      left.assign(sorted.begin(), sorted.begin() + sorted.size() / 2);
      right.assign(sorted.begin() + sorted.size() / 2, sorted.end());
      return !left.empty() && !right.empty();
    }
    for (int t : idx) {
      if (bin_of(t) <= best_b)
        left.push_back(t);
      else
        right.push_back(t);
    }
    return !left.empty() && !right.empty();
  }

  void build_recursive(int node_id, std::vector<int>&& idx) {
    if ((int)idx.size() <= leaf_width) {
      nodes[node_id].tris = std::move(idx);
      return;
    }
    std::vector<int> left, right;
    if (!split(idx, left, right)) {
      nodes[node_id].tris = std::move(idx);  // give up: oversized leaf split below
      // split oversized leaves into chains of leaf_width is handled by caller
      // contract: we instead force a median split
      return;
    }
    const int l = make_node(left);
    const int r = make_node(right);
    nodes[node_id].left = l;
    nodes[node_id].right = r;
    build_recursive(l, std::move(left));
    build_recursive(r, std::move(right));
  }
};

}  // namespace

extern "C" {

// Returns the node count, or -1 on error.  Output arrays must be sized:
//   aabb_min/aabb_max: [2*n_faces, 3]; miss/leaf_start/leaf_count: [2*n_faces]
//   tri_p0/e1/e2: [n_faces*2*leaf_width... safe bound: 2*n_faces*leaf_width, 3]
//   tri_prim:     [2*n_faces*leaf_width]
// packed_count receives the packed triangle-slot count.
int32_t texir_build_bvh(
    const float* verts, int32_t n_verts, const int32_t* faces, int32_t n_faces,
    int32_t leaf_width,
    float* aabb_min, float* aabb_max, int32_t* miss, int32_t* leaf_start,
    int32_t* leaf_count, float* tri_p0, float* tri_e1, float* tri_e2,
    int32_t* tri_prim, int32_t* packed_count) {
  if (n_faces <= 0 || leaf_width <= 0) return -1;
  Builder b;
  b.leaf_width = leaf_width;
  b.verts = verts;
  b.faces = faces;
  b.cmin.resize(n_faces);
  b.cmax.resize(n_faces);
  b.cent.resize(n_faces);
  for (int f = 0; f < n_faces; ++f) {
    Vec3 c0 = b.corner(f, 0), c1 = b.corner(f, 1), c2 = b.corner(f, 2);
    b.cmin[f] = vmin(vmin(c0, c1), c2);
    b.cmax[f] = vmax(vmax(c0, c1), c2);
    b.cent[f] = {(b.cmin[f].x + b.cmax[f].x) * 0.5f,
                 (b.cmin[f].y + b.cmax[f].y) * 0.5f,
                 (b.cmin[f].z + b.cmax[f].z) * 0.5f};
  }
  std::vector<int> all(n_faces);
  for (int f = 0; f < n_faces; ++f) all[f] = f;
  const int root = b.make_node(all);
  b.build_recursive(root, std::move(all));

  // handle any oversized leaves (failed splits) by chopping into chains:
  // represented as sequential sibling leaves under a fresh inner node
  for (size_t i = 0; i < b.nodes.size(); ++i) {
    if ((int)b.nodes[i].tris.size() > leaf_width) {
      std::vector<int> tris = std::move(b.nodes[i].tris);
      b.nodes[i].tris.clear();
      // binary-split the list evenly until pieces fit
      std::vector<std::vector<int>> pieces{tris};
      bool again = true;
      while (again) {
        again = false;
        std::vector<std::vector<int>> next;
        for (auto& p : pieces) {
          if ((int)p.size() > leaf_width) {
            next.emplace_back(p.begin(), p.begin() + p.size() / 2);
            next.emplace_back(p.begin() + p.size() / 2, p.end());
            again = true;
          } else {
            next.push_back(std::move(p));
          }
        }
        pieces = std::move(next);
      }
      // build a small right-leaning chain of inner nodes
      int cur = (int)i;
      for (size_t p = 0; p < pieces.size(); ++p) {
        if (p + 1 == pieces.size()) {
          // last piece becomes cur itself if cur is fresh-leaf slot
          b.nodes[cur].tris = std::move(pieces[p]);
          b.nodes[cur].left = b.nodes[cur].right = -1;
        } else {
          BuildNode leaf;
          leaf.bmin = {1e30f, 1e30f, 1e30f};
          leaf.bmax = {-1e30f, -1e30f, -1e30f};
          for (int t : pieces[p]) {
            leaf.bmin = vmin(leaf.bmin, b.cmin[t]);
            leaf.bmax = vmax(leaf.bmax, b.cmax[t]);
          }
          leaf.tris = std::move(pieces[p]);
          b.nodes.push_back(std::move(leaf));
          const int leaf_id = (int)b.nodes.size() - 1;
          BuildNode rest;
          rest.bmin = b.nodes[cur].bmin;
          rest.bmax = b.nodes[cur].bmax;
          b.nodes.push_back(std::move(rest));
          const int rest_id = (int)b.nodes.size() - 1;
          b.nodes[cur].left = leaf_id;
          b.nodes[cur].right = rest_id;
          b.nodes[cur].tris.clear();
          cur = rest_id;
        }
      }
    }
  }

  // DFS flatten with miss links
  const int n = (int)b.nodes.size();
  std::vector<int> order;
  order.reserve(n);
  std::vector<int> new_id(n, -1), miss_old(n, -1);
  std::vector<std::pair<int, int>> stack{{root, -1}};
  while (!stack.empty()) {
    auto [old, m] = stack.back();
    stack.pop_back();
    new_id[old] = (int)order.size();
    order.push_back(old);
    miss_old[old] = m;
    if (b.nodes[old].left >= 0) {
      stack.push_back({b.nodes[old].right, m});
      stack.push_back({b.nodes[old].left, b.nodes[old].right});
    }
  }

  int slot = 0;
  for (int k = 0; k < (int)order.size(); ++k) {
    const int old = order[k];
    const BuildNode& nd = b.nodes[old];
    aabb_min[3 * k] = nd.bmin.x;
    aabb_min[3 * k + 1] = nd.bmin.y;
    aabb_min[3 * k + 2] = nd.bmin.z;
    aabb_max[3 * k] = nd.bmax.x;
    aabb_max[3 * k + 1] = nd.bmax.y;
    aabb_max[3 * k + 2] = nd.bmax.z;
    miss[k] = miss_old[old] >= 0 ? new_id[miss_old[old]] : -1;
    if (nd.left < 0) {
      leaf_start[k] = slot;
      leaf_count[k] = (int)nd.tris.size();
      for (int j = 0; j < leaf_width; ++j) {
        const int dst = slot + j;
        if (j < (int)nd.tris.size()) {
          const int f = nd.tris[j];
          const Vec3 p0 = b.corner(f, 0), p1 = b.corner(f, 1), p2 = b.corner(f, 2);
          tri_p0[3 * dst] = p0.x;
          tri_p0[3 * dst + 1] = p0.y;
          tri_p0[3 * dst + 2] = p0.z;
          tri_e1[3 * dst] = p1.x - p0.x;
          tri_e1[3 * dst + 1] = p1.y - p0.y;
          tri_e1[3 * dst + 2] = p1.z - p0.z;
          tri_e2[3 * dst] = p2.x - p0.x;
          tri_e2[3 * dst + 1] = p2.y - p0.y;
          tri_e2[3 * dst + 2] = p2.z - p0.z;
          tri_prim[dst] = f;
        } else {
          tri_p0[3 * dst] = tri_p0[3 * dst + 1] = tri_p0[3 * dst + 2] = 0.f;
          tri_e1[3 * dst] = tri_e1[3 * dst + 1] = tri_e1[3 * dst + 2] = 0.f;
          tri_e2[3 * dst] = tri_e2[3 * dst + 1] = tri_e2[3 * dst + 2] = 0.f;
          tri_prim[dst] = -1;
        }
      }
      slot += leaf_width;
    } else {
      leaf_start[k] = -1;
      leaf_count[k] = 0;
    }
  }
  *packed_count = slot;
  return (int)order.size();
}

// Texture-space geometry bake: per atlas texel, barycentric world position +
// shading normal of the covering triangle.  Arrays:
//   verts [n_verts,3]; faces [n_faces,3]; vnormals [n_verts,3];
//   tri_uvs [n_faces*3, 2] (per-corner uv);
//   position/normal out [res*res, 3]; valid out [res*res] (uint8)
void texir_bake_geometry(
    const float* verts, int32_t n_verts, const int32_t* faces, int32_t n_faces,
    const float* vnormals, const float* tri_uvs, int32_t res,
    float* position, float* normal, uint8_t* valid) {
  std::memset(valid, 0, (size_t)res * res);
  for (int f = 0; f < n_faces; ++f) {
    float ax = tri_uvs[6 * f] * res - 0.5f, ay = tri_uvs[6 * f + 1] * res - 0.5f;
    float bx = tri_uvs[6 * f + 2] * res - 0.5f, by = tri_uvs[6 * f + 3] * res - 0.5f;
    float cx = tri_uvs[6 * f + 4] * res - 0.5f, cy = tri_uvs[6 * f + 5] * res - 0.5f;
    const int x0 = std::max((int)std::floor(std::min({ax, bx, cx})), 0);
    const int x1 = std::min((int)std::ceil(std::max({ax, bx, cx})) + 1, res);
    const int y0 = std::max((int)std::floor(std::min({ay, by, cy})), 0);
    const int y1 = std::min((int)std::ceil(std::max({ay, by, cy})) + 1, res);
    if (x1 <= x0 || y1 <= y0) continue;
    const float v0x = bx - ax, v0y = by - ay;
    const float v1x = cx - ax, v1y = cy - ay;
    const float d00 = v0x * v0x + v0y * v0y;
    const float d01 = v0x * v1x + v0y * v1y;
    const float d11 = v1x * v1x + v1y * v1y;
    const float denom = d00 * d11 - d01 * d01;
    if (std::fabs(denom) < 1e-12f) continue;
    const int32_t* fv = faces + 3 * f;
    for (int y = y0; y < y1; ++y) {
      for (int x = x0; x < x1; ++x) {
        const float px = (float)x - ax, py = (float)y - ay;
        const float d20 = px * v0x + py * v0y;
        const float d21 = px * v1x + py * v1y;
        const float u = (d11 * d20 - d01 * d21) / denom;
        const float v = (d00 * d21 - d01 * d20) / denom;
        const float w = 1.0f - u - v;
        if (u < -1e-6f || v < -1e-6f || w < -1e-6f) continue;
        const size_t o = ((size_t)y * res + x) * 3;
        float nx = 0, ny = 0, nz = 0;
        const float wgt[3] = {w, u, v};
        for (int c = 0; c < 3; ++c) {
          const int32_t vi = fv[c];
          position[o] += 0;  // overwritten below
          nx += wgt[c] * vnormals[3 * vi];
          ny += wgt[c] * vnormals[3 * vi + 1];
          nz += wgt[c] * vnormals[3 * vi + 2];
        }
        const float inv = 1.0f / std::max(std::sqrt(nx * nx + ny * ny + nz * nz), 1e-12f);
        position[o] = w * verts[3 * fv[0]] + u * verts[3 * fv[1]] + v * verts[3 * fv[2]];
        position[o + 1] =
            w * verts[3 * fv[0] + 1] + u * verts[3 * fv[1] + 1] + v * verts[3 * fv[2] + 1];
        position[o + 2] =
            w * verts[3 * fv[0] + 2] + u * verts[3 * fv[1] + 2] + v * verts[3 * fv[2] + 2];
        normal[o] = nx * inv;
        normal[o + 1] = ny * inv;
        normal[o + 2] = nz * inv;
        valid[(size_t)y * res + x] = 1;
      }
    }
  }
}

}  // extern "C"
