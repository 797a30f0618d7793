// BVH ray-mesh intersector — native C++ replacement for the reference's
// Embree dependency (reference evaluation/clean_mesh.py:216
// trimesh.ray.ray_pyembree.RayMeshIntersector.intersects_first).
//
// Median-split BVH over triangles, iterative stack traversal,
// Moller-Trumbore intersection, OpenMP-parallel ray batches.
// C ABI for ctypes binding (see uforecon_tpu/postproc/raycast.py).
//
// Build: g++ -O3 -march=native -fopenmp -shared -fPIC bvh.cpp -o libuforecon_bvh.so

#include <algorithm>
#include <cfloat>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct AABB {
  float lo[3], hi[3];
  void reset() {
    for (int k = 0; k < 3; ++k) { lo[k] = FLT_MAX; hi[k] = -FLT_MAX; }
  }
  void grow(const float* p) {
    for (int k = 0; k < 3; ++k) {
      lo[k] = std::min(lo[k], p[k]);
      hi[k] = std::max(hi[k], p[k]);
    }
  }
  void grow(const AABB& b) {
    for (int k = 0; k < 3; ++k) {
      lo[k] = std::min(lo[k], b.lo[k]);
      hi[k] = std::max(hi[k], b.hi[k]);
    }
  }
};

struct Node {
  AABB box;
  int32_t left = -1;    // child index; -1 for leaf
  int32_t right = -1;
  int32_t start = 0;    // leaf: first triangle in order[]
  int32_t count = 0;    // leaf: number of triangles
};

struct BVH {
  std::vector<float> verts;      // 3 * n_verts
  std::vector<int32_t> faces;    // 3 * n_faces
  std::vector<int32_t> order;    // triangle permutation
  std::vector<Node> nodes;

  const float* v(int32_t i) const { return &verts[3 * i]; }

  void tri_bounds(int32_t t, AABB* out, float* centroid) const {
    out->reset();
    centroid[0] = centroid[1] = centroid[2] = 0.f;
    for (int j = 0; j < 3; ++j) {
      const float* p = v(faces[3 * t + j]);
      out->grow(p);
      for (int k = 0; k < 3; ++k) centroid[k] += p[k] / 3.f;
    }
  }

  int32_t build(std::vector<AABB>& boxes, std::vector<float>& cents,
                int32_t start, int32_t count) {
    Node node;
    node.box.reset();
    for (int32_t i = start; i < start + count; ++i)
      node.box.grow(boxes[order[i]]);

    if (count <= 4) {
      node.start = start;
      node.count = count;
      nodes.push_back(node);
      return (int32_t)nodes.size() - 1;
    }
    // split along the widest centroid axis at the median
    AABB cb; cb.reset();
    for (int32_t i = start; i < start + count; ++i)
      cb.grow(&cents[3 * order[i]]);
    int axis = 0;
    float ext = -1.f;
    for (int k = 0; k < 3; ++k) {
      float e = cb.hi[k] - cb.lo[k];
      if (e > ext) { ext = e; axis = k; }
    }
    int32_t mid = start + count / 2;
    std::nth_element(order.begin() + start, order.begin() + mid,
                     order.begin() + start + count,
                     [&](int32_t a, int32_t b) {
                       return cents[3 * a + axis] < cents[3 * b + axis];
                     });
    int32_t self = (int32_t)nodes.size();
    nodes.push_back(node);  // placeholder; children appended after
    int32_t l = build(boxes, cents, start, mid - start);
    int32_t r = build(boxes, cents, mid, start + count - mid);
    nodes[self].left = l;
    nodes[self].right = r;
    return self;
  }
};

inline bool ray_box(const AABB& b, const float* o, const float* inv_d,
                    float t_max) {
  float t0 = 0.f, t1 = t_max;
  for (int k = 0; k < 3; ++k) {
    float ta = (b.lo[k] - o[k]) * inv_d[k];
    float tb = (b.hi[k] - o[k]) * inv_d[k];
    if (ta > tb) std::swap(ta, tb);
    t0 = std::max(t0, ta);
    t1 = std::min(t1, tb);
    if (t0 > t1) return false;
  }
  return true;
}

// Moller-Trumbore; returns t>=0 on hit else -1
inline float ray_tri(const float* o, const float* d, const float* p0,
                     const float* p1, const float* p2) {
  float e1[3], e2[3], pv[3], tv[3], qv[3];
  for (int k = 0; k < 3; ++k) { e1[k] = p1[k] - p0[k]; e2[k] = p2[k] - p0[k]; }
  pv[0] = d[1] * e2[2] - d[2] * e2[1];
  pv[1] = d[2] * e2[0] - d[0] * e2[2];
  pv[2] = d[0] * e2[1] - d[1] * e2[0];
  float det = e1[0] * pv[0] + e1[1] * pv[1] + e1[2] * pv[2];
  if (std::fabs(det) < 1e-12f) return -1.f;
  float inv = 1.f / det;
  for (int k = 0; k < 3; ++k) tv[k] = o[k] - p0[k];
  float u = (tv[0] * pv[0] + tv[1] * pv[1] + tv[2] * pv[2]) * inv;
  if (u < -1e-6f || u > 1.f + 1e-6f) return -1.f;
  qv[0] = tv[1] * e1[2] - tv[2] * e1[1];
  qv[1] = tv[2] * e1[0] - tv[0] * e1[2];
  qv[2] = tv[0] * e1[1] - tv[1] * e1[0];
  float vv = (d[0] * qv[0] + d[1] * qv[1] + d[2] * qv[2]) * inv;
  if (vv < -1e-6f || u + vv > 1.f + 1e-6f) return -1.f;
  float t = (e2[0] * qv[0] + e2[1] * qv[1] + e2[2] * qv[2]) * inv;
  return t >= 0.f ? t : -1.f;
}

}  // namespace

extern "C" {

void* bvh_build(const float* verts, int64_t n_verts, const int32_t* faces,
                int64_t n_faces) {
  BVH* bvh = new BVH();
  bvh->verts.assign(verts, verts + 3 * n_verts);
  bvh->faces.assign(faces, faces + 3 * n_faces);
  bvh->order.resize(n_faces);
  for (int64_t i = 0; i < n_faces; ++i) bvh->order[i] = (int32_t)i;

  std::vector<AABB> boxes(n_faces);
  std::vector<float> cents(3 * n_faces);
  for (int64_t t = 0; t < n_faces; ++t)
    bvh->tri_bounds((int32_t)t, &boxes[t], &cents[3 * t]);
  bvh->nodes.reserve(2 * n_faces);
  if (n_faces > 0) bvh->build(boxes, cents, 0, (int32_t)n_faces);
  return bvh;
}

void bvh_free(void* handle) { delete (BVH*)handle; }

// First hit per ray: out_tri[i] = triangle index or -1; out_t[i] = distance.
void bvh_intersect_first(void* handle, const float* origins, const float* dirs,
                         int64_t n_rays, int32_t* out_tri, float* out_t) {
  const BVH* bvh = (const BVH*)handle;
  if (bvh->nodes.empty()) {
    for (int64_t i = 0; i < n_rays; ++i) { out_tri[i] = -1; out_t[i] = -1.f; }
    return;
  }
#pragma omp parallel for schedule(dynamic, 256)
  for (int64_t i = 0; i < n_rays; ++i) {
    const float* o = &origins[3 * i];
    const float* d = &dirs[3 * i];
    float inv_d[3];
    for (int k = 0; k < 3; ++k)
      inv_d[k] = 1.f / (std::fabs(d[k]) > 1e-12f ? d[k]
                        : (d[k] >= 0 ? 1e-12f : -1e-12f));
    float best_t = FLT_MAX;
    int32_t best = -1;
    int32_t stack[64];
    int sp = 0;
    stack[sp++] = 0;
    while (sp > 0) {
      const Node& n = bvh->nodes[stack[--sp]];
      if (!ray_box(n.box, o, inv_d, best_t)) continue;
      if (n.left < 0) {
        for (int32_t j = n.start; j < n.start + n.count; ++j) {
          int32_t tri = bvh->order[j];
          const int32_t* f = &bvh->faces[3 * tri];
          float t = ray_tri(o, d, bvh->v(f[0]), bvh->v(f[1]), bvh->v(f[2]));
          if (t >= 0.f && t < best_t) { best_t = t; best = tri; }
        }
      } else {
        if (sp < 62) { stack[sp++] = n.left; stack[sp++] = n.right; }
      }
    }
    out_tri[i] = best;
    out_t[i] = best >= 0 ? best_t : -1.f;
  }
}

// Any-hit per ray within [0, t_max]: out_hit[i] in {0,1}.
void bvh_intersect_any(void* handle, const float* origins, const float* dirs,
                       const float* t_max, int64_t n_rays, uint8_t* out_hit) {
  const BVH* bvh = (const BVH*)handle;
  if (bvh->nodes.empty()) {
    std::memset(out_hit, 0, n_rays);
    return;
  }
#pragma omp parallel for schedule(dynamic, 256)
  for (int64_t i = 0; i < n_rays; ++i) {
    const float* o = &origins[3 * i];
    const float* d = &dirs[3 * i];
    float tm = t_max ? t_max[i] : FLT_MAX;
    float inv_d[3];
    for (int k = 0; k < 3; ++k)
      inv_d[k] = 1.f / (std::fabs(d[k]) > 1e-12f ? d[k]
                        : (d[k] >= 0 ? 1e-12f : -1e-12f));
    uint8_t hit = 0;
    int32_t stack[64];
    int sp = 0;
    stack[sp++] = 0;
    while (sp > 0 && !hit) {
      const Node& n = bvh->nodes[stack[--sp]];
      if (!ray_box(n.box, o, inv_d, tm)) continue;
      if (n.left < 0) {
        for (int32_t j = n.start; j < n.start + n.count; ++j) {
          int32_t tri = bvh->order[j];
          const int32_t* f = &bvh->faces[3 * tri];
          float t = ray_tri(o, d, bvh->v(f[0]), bvh->v(f[1]), bvh->v(f[2]));
          if (t >= 0.f && t <= tm) { hit = 1; break; }
        }
      } else {
        if (sp < 62) { stack[sp++] = n.left; stack[sp++] = n.right; }
      }
    }
    out_hit[i] = hit;
  }
}

}  // extern "C"
