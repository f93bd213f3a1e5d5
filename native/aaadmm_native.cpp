// Native host-side runtime components for aa_admm_tpu.
//
// TPU-native equivalents of the reference's C++ host infrastructure:
//   * OBJ / TetGen .ele+.node mesh parsing (mclscene MeshIO.hpp:55,180 and
//     the OpenMesh OBJ reader used by the Geometry apps)
//   * a median-split AABB tree with batched point-to-trimesh closest-point
//     queries (igl::AABB + point_simplex_squared_distance as used by
//     TriMeshAABB.h:38-77 and ReferenceSurfceConstraint, Constraint.h:377)
//
// Exposed through a plain C ABI and loaded via ctypes (no pybind11 in the
// image). The JAX compute path has its own on-device brute-force
// closest-point kernel; this library serves host-side setup, preprocessing,
// and error metrics where tree queries beat brute force on CPU.
//
// Build: see native/Makefile (g++ -O3 -fopenmp -shared -fPIC).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

namespace {

struct Vec3 {
  double x, y, z;
  Vec3 operator-(const Vec3 &o) const { return {x - o.x, y - o.y, z - o.z}; }
  Vec3 operator+(const Vec3 &o) const { return {x + o.x, y + o.y, z + o.z}; }
  Vec3 operator*(double s) const { return {x * s, y * s, z * s}; }
  double dot(const Vec3 &o) const { return x * o.x + y * o.y + z * o.z; }
};

// Ericson 5.1.5 closest point on triangle.
Vec3 closest_on_tri(const Vec3 &p, const Vec3 &a, const Vec3 &b,
                    const Vec3 &c) {
  Vec3 ab = b - a, ac = c - a, ap = p - a;
  double d1 = ab.dot(ap), d2 = ac.dot(ap);
  if (d1 <= 0 && d2 <= 0) return a;
  Vec3 bp = p - b;
  double d3 = ab.dot(bp), d4 = ac.dot(bp);
  if (d3 >= 0 && d4 <= d3) return b;
  double vc = d1 * d4 - d3 * d2;
  if (vc <= 0 && d1 >= 0 && d3 <= 0) {
    double v = d1 / (d1 - d3);
    return a + ab * v;
  }
  Vec3 cp = p - c;
  double d5 = ab.dot(cp), d6 = ac.dot(cp);
  if (d6 >= 0 && d5 <= d6) return c;
  double vb = d5 * d2 - d1 * d6;
  if (vb <= 0 && d2 >= 0 && d6 <= 0) {
    double w = d2 / (d2 - d6);
    return a + ac * w;
  }
  double va = d3 * d6 - d5 * d4;
  if (va <= 0 && (d4 - d3) >= 0 && (d5 - d6) >= 0) {
    double w = (d4 - d3) / ((d4 - d3) + (d5 - d6));
    return b + (c - b) * w;
  }
  double denom = 1.0 / (va + vb + vc);
  double v = vb * denom, w = vc * denom;
  return a + ab * v + ac * w;
}

double sqdist(const Vec3 &a, const Vec3 &b) {
  Vec3 d = a - b;
  return d.dot(d);
}

struct AabbNode {
  double lo[3], hi[3];
  int32_t left;   // child index or -1
  int32_t right;  // child index, or (begin) when leaf
  int32_t begin, count;  // leaf triangle range
};

struct Tree {
  std::vector<AabbNode> nodes;
  std::vector<int32_t> tri_order;
  std::vector<Vec3> va, vb, vc;  // triangle corners in tri_order
};

struct BuildTri {
  Vec3 a, b, c, centroid;
  int32_t idx;
};

void node_bounds(AabbNode &n, const std::vector<BuildTri> &tris, int b,
                 int e) {
  for (int k = 0; k < 3; ++k) {
    n.lo[k] = 1e300;
    n.hi[k] = -1e300;
  }
  for (int i = b; i < e; ++i) {
    const Vec3 *pts[3] = {&tris[i].a, &tris[i].b, &tris[i].c};
    for (const Vec3 *p : pts) {
      double v[3] = {p->x, p->y, p->z};
      for (int k = 0; k < 3; ++k) {
        n.lo[k] = std::min(n.lo[k], v[k]);
        n.hi[k] = std::max(n.hi[k], v[k]);
      }
    }
  }
}

int build_node(Tree &t, std::vector<BuildTri> &tris, int b, int e,
               int leaf_size) {
  int idx = (int)t.nodes.size();
  t.nodes.push_back({});
  AabbNode n;
  node_bounds(n, tris, b, e);
  if (e - b <= leaf_size) {
    n.left = -1;
    n.begin = b;
    n.count = e - b;
    t.nodes[idx] = n;
    return idx;
  }
  // Median split on the widest centroid axis.
  double clo[3] = {1e300, 1e300, 1e300}, chi[3] = {-1e300, -1e300, -1e300};
  for (int i = b; i < e; ++i) {
    double v[3] = {tris[i].centroid.x, tris[i].centroid.y, tris[i].centroid.z};
    for (int k = 0; k < 3; ++k) {
      clo[k] = std::min(clo[k], v[k]);
      chi[k] = std::max(chi[k], v[k]);
    }
  }
  int axis = 0;
  double width = chi[0] - clo[0];
  for (int k = 1; k < 3; ++k)
    if (chi[k] - clo[k] > width) {
      width = chi[k] - clo[k];
      axis = k;
    }
  int mid = (b + e) / 2;
  std::nth_element(tris.begin() + b, tris.begin() + mid, tris.begin() + e,
                   [axis](const BuildTri &p, const BuildTri &q) {
                     const double *pv = &p.centroid.x;
                     const double *qv = &q.centroid.x;
                     return pv[axis] < qv[axis];
                   });
  n.left = build_node(t, tris, b, mid, leaf_size);
  n.right = build_node(t, tris, mid, e, leaf_size);
  n.begin = -1;
  n.count = 0;
  t.nodes[idx] = n;
  return idx;
}

double box_sqdist(const AabbNode &n, const Vec3 &p) {
  double pv[3] = {p.x, p.y, p.z};
  double d = 0;
  for (int k = 0; k < 3; ++k) {
    double v = std::max(n.lo[k] - pv[k], std::max(0.0, pv[k] - n.hi[k]));
    d += v * v;
  }
  return d;
}

void query_tree(const Tree &t, const Vec3 &p, double &best_d, Vec3 &best_q) {
  // Stackless-ish: explicit stack of node indices.
  int stack[128];
  int sp = 0;
  stack[sp++] = 0;
  while (sp) {
    int ni = stack[--sp];
    const AabbNode &n = t.nodes[ni];
    if (box_sqdist(n, p) >= best_d) continue;
    if (n.left < 0) {
      for (int i = n.begin; i < n.begin + n.count; ++i) {
        Vec3 q = closest_on_tri(p, t.va[i], t.vb[i], t.vc[i]);
        double d = sqdist(p, q);
        if (d < best_d) {
          best_d = d;
          best_q = q;
        }
      }
    } else {
      // Visit nearer child first.
      double dl = box_sqdist(t.nodes[n.left], p);
      double dr = box_sqdist(t.nodes[n.right], p);
      if (dl < dr) {
        if (sp < 126) stack[sp++] = n.right;
        if (sp < 126) stack[sp++] = n.left;
      } else {
        if (sp < 126) stack[sp++] = n.left;
        if (sp < 126) stack[sp++] = n.right;
      }
    }
  }
}

}  // namespace

extern "C" {

// ---- AABB tree ----

void *aabb_build(const double *verts, int64_t n_verts, const int32_t *tris,
                 int64_t n_tris) {
  (void)n_verts;
  Tree *t = new Tree();
  std::vector<BuildTri> bt(n_tris);
  for (int64_t i = 0; i < n_tris; ++i) {
    const int32_t *f = tris + 3 * i;
    Vec3 a = {verts[3 * f[0]], verts[3 * f[0] + 1], verts[3 * f[0] + 2]};
    Vec3 b = {verts[3 * f[1]], verts[3 * f[1] + 1], verts[3 * f[1] + 2]};
    Vec3 c = {verts[3 * f[2]], verts[3 * f[2] + 1], verts[3 * f[2] + 2]};
    bt[i] = {a, b, c, (a + b + c) * (1.0 / 3.0), (int32_t)i};
  }
  build_node(*t, bt, 0, (int)n_tris, 4);
  t->va.resize(n_tris);
  t->vb.resize(n_tris);
  t->vc.resize(n_tris);
  t->tri_order.resize(n_tris);
  for (int64_t i = 0; i < n_tris; ++i) {
    t->va[i] = bt[i].a;
    t->vb[i] = bt[i].b;
    t->vc[i] = bt[i].c;
    t->tri_order[i] = bt[i].idx;
  }
  return t;
}

void aabb_free(void *tree) { delete (Tree *)tree; }

void aabb_closest_points(void *tree, const double *queries, int64_t n_queries,
                         double *out_points, double *out_sqdist) {
  Tree *t = (Tree *)tree;
#pragma omp parallel for schedule(dynamic, 64)
  for (int64_t i = 0; i < n_queries; ++i) {
    Vec3 p = {queries[3 * i], queries[3 * i + 1], queries[3 * i + 2]};
    double best = 1e300;
    Vec3 q = p;
    query_tree(*t, p, best, q);
    out_points[3 * i] = q.x;
    out_points[3 * i + 1] = q.y;
    out_points[3 * i + 2] = q.z;
    if (out_sqdist) out_sqdist[i] = best;
  }
}

// ---- Mesh IO ----

// Parses an OBJ; returns counts via out params. Call twice: first with null
// buffers to get counts, then with allocated buffers. (Simple + safe across
// the ctypes boundary; parse cost dominated by strtod either way.)
int obj_parse(const char *path, double *verts, int64_t *n_verts,
              int32_t *tris, int64_t *n_tris) {
  FILE *f = fopen(path, "rb");
  if (!f) return -1;
  int64_t nv = 0, nt = 0;
  char line[4096];
  std::vector<int64_t> poly;
  while (fgets(line, sizeof line, f)) {
    if (line[0] == 'v' && (line[1] == ' ' || line[1] == '\t')) {
      if (verts) {
        char *p = line + 2;
        for (int k = 0; k < 3; ++k) verts[3 * nv + k] = strtod(p, &p);
      }
      nv++;
    } else if (line[0] == 'f' && (line[1] == ' ' || line[1] == '\t')) {
      poly.clear();
      char *p = line + 2;
      while (*p) {
        while (*p == ' ' || *p == '\t') ++p;
        if (*p == '\n' || *p == '\r' || *p == 0) break;
        long idx = strtol(p, &p, 10);
        if (idx != 0) poly.push_back(idx > 0 ? idx - 1 : nv + idx);
        while (*p && *p != ' ' && *p != '\t' && *p != '\n') ++p;  // skip /..
      }
      for (size_t k = 1; k + 1 < poly.size(); ++k) {
        if (tris) {
          tris[3 * nt] = (int32_t)poly[0];
          tris[3 * nt + 1] = (int32_t)poly[k];
          tris[3 * nt + 2] = (int32_t)poly[k + 1];
        }
        nt++;
      }
    }
  }
  fclose(f);
  *n_verts = nv;
  *n_tris = nt;
  return 0;
}

int elenode_parse(const char *ele_path, const char *node_path, double *verts,
                  int64_t *n_verts, int32_t *tets, int64_t *n_tets) {
  FILE *fe = fopen(ele_path, "rb");
  if (!fe) return -1;
  FILE *fn = fopen(node_path, "rb");
  if (!fn) {
    fclose(fe);
    return -2;
  }
  char line[4096];
  int64_t nt = 0, nv = 0;
  if (fgets(line, sizeof line, fe)) nt = strtol(line, nullptr, 10);
  if (fgets(line, sizeof line, fn)) nv = strtol(line, nullptr, 10);
  if (tets) {
    int64_t min_idx = 1 << 30;
    std::vector<int64_t> raw(4 * nt);
    for (int64_t i = 0; i < nt; ++i) {
      if (!fgets(line, sizeof line, fe)) break;
      char *p = line;
      strtol(p, &p, 10);  // id
      for (int k = 0; k < 4; ++k) {
        raw[4 * i + k] = strtol(p, &p, 10);
        min_idx = std::min(min_idx, raw[4 * i + k]);
      }
    }
    int64_t off = (min_idx == 1) ? 1 : 0;
    for (int64_t i = 0; i < 4 * nt; ++i) tets[i] = (int32_t)(raw[i] - off);
  }
  if (verts) {
    for (int64_t i = 0; i < nv; ++i) {
      if (!fgets(line, sizeof line, fn)) break;
      char *p = line;
      strtol(p, &p, 10);  // id
      for (int k = 0; k < 3; ++k) verts[3 * i + k] = strtod(p, &p);
    }
  }
  fclose(fe);
  fclose(fn);
  *n_tets = nt;
  *n_verts = nv;
  return 0;
}

}  // extern "C"
