// Quadric edge-collapse mesh decimation (Garland–Heckbert 1997).
//
// Native replacement for the reference's trimesh quadric decimation
// (2_charactor_reconstructor/instant_nsr/utils/mesh_utils.py:10-22, which
// calls trimesh.simplify_quadric_decimation → open3d/fast-simplification).
// Exported with a C ABI for ctypes.

#include <algorithm>
#include <array>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <functional>
#include <queue>
#include <unordered_map>
#include <unordered_set>
#include <vector>

namespace {

struct Quadric {
  // symmetric 4x4: stored as upper triangle [a..j]
  double m[10] = {0};
  void add_plane(double a, double b, double c, double d) {
    m[0] += a * a; m[1] += a * b; m[2] += a * c; m[3] += a * d;
    m[4] += b * b; m[5] += b * c; m[6] += b * d;
    m[7] += c * c; m[8] += c * d;
    m[9] += d * d;
  }
  Quadric operator+(const Quadric& o) const {
    Quadric q;
    for (int i = 0; i < 10; ++i) q.m[i] = m[i] + o.m[i];
    return q;
  }
  double eval(double x, double y, double z) const {
    return m[0] * x * x + 2 * m[1] * x * y + 2 * m[2] * x * z + 2 * m[3] * x
         + m[4] * y * y + 2 * m[5] * y * z + 2 * m[6] * y
         + m[7] * z * z + 2 * m[8] * z + m[9];
  }
};

struct Edge {
  double cost;
  int v0, v1;
  int gen;  // generation for lazy invalidation
  bool operator>(const Edge& o) const { return cost > o.cost; }
};

// Fast pre-pass: rounds of deterministic short-edge collapse (midpoint
// placement, one collapse per vertex per round). Dense marching-tets output
// has ~half its edges far below the final 50k-face feature scale; removing
// them in linear time cuts the QEM heap's input 3-5x. Topology-aware (only
// mesh edges collapse, degenerate faces dropped), unlike grid clustering,
// which would weld the front/back sheets of thin parts.
void prepass_collapse(std::vector<std::array<double, 3>>& pos,
                      std::vector<std::array<int, 3>>& faces,
                      int target_faces, int max_rounds) {
  for (int round = 0; round < max_rounds; ++round) {
    size_t nf = faces.size();
    if (int(nf) <= 16 * target_faces) return;
    // mean edge length sets the collapse threshold
    double sum = 0.0;
    size_t cnt = 0;
    for (auto& f : faces)
      for (int k = 0; k < 3; ++k) {
        auto &a = pos[f[k]], &b = pos[f[(k + 1) % 3]];
        double dx = a[0] - b[0], dy = a[1] - b[1], dz = a[2] - b[2];
        sum += std::sqrt(dx * dx + dy * dy + dz * dz);
        ++cnt;
      }
    double thresh2 = sum / double(cnt);
    thresh2 *= thresh2;

    std::vector<int> parent(pos.size());
    for (size_t i = 0; i < parent.size(); ++i) parent[i] = int(i);
    std::function<int(int)> find = [&](int x) {
      while (parent[x] != x) {
        parent[x] = parent[parent[x]];
        x = parent[x];
      }
      return x;
    };
    std::vector<bool> touched(pos.size(), false);
    size_t collapsed = 0;
    for (auto& f : faces)
      for (int k = 0; k < 3; ++k) {
        int a = f[k], b = f[(k + 1) % 3];
        if (touched[a] || touched[b] || a == b) continue;
        auto &pa = pos[a], &pb = pos[b];
        double dx = pa[0] - pb[0], dy = pa[1] - pb[1], dz = pa[2] - pb[2];
        if (dx * dx + dy * dy + dz * dz >= thresh2) continue;
        pos[a] = {(pa[0] + pb[0]) / 2, (pa[1] + pb[1]) / 2,
                  (pa[2] + pb[2]) / 2};
        parent[b] = a;
        touched[a] = touched[b] = true;
        ++collapsed;
      }
    if (collapsed == 0) return;
    // rebuild compact mesh
    std::vector<std::array<int, 3>> nfaces;
    nfaces.reserve(nf);
    for (auto& f : faces) {
      int r0 = find(f[0]), r1 = find(f[1]), r2 = find(f[2]);
      if (r0 == r1 || r1 == r2 || r0 == r2) continue;
      nfaces.push_back({r0, r1, r2});
    }
    faces.swap(nfaces);
    if (collapsed < nf / 20) return;
  }
}

// QEM core over pos/faces vectors; fills outputs. Shared by dsu_decimate
// (raw) and dsu_decimate_fast (pre-pass + QEM).
int qem_core(std::vector<std::array<double, 3>>& pos,
             std::vector<std::array<int, 3>>& faces, int target_faces,
             float* out_verts, int* out_faces, int* out_nv, int* out_nf);

}  // namespace

extern "C" {

// Decimate to ~target_faces. out_verts/out_faces must be preallocated with
// the input sizes. Returns 0 on success; writes new counts.
int dsu_decimate(const float* verts_in, int nv, const int* faces_in, int nf,
                 int target_faces, float* out_verts, int* out_faces,
                 int* out_nv, int* out_nf) {
  std::vector<std::array<double, 3>> pos(nv);
  for (int i = 0; i < nv; ++i)
    pos[i] = {verts_in[3 * i], verts_in[3 * i + 1], verts_in[3 * i + 2]};
  std::vector<std::array<int, 3>> faces(nf);
  for (int i = 0; i < nf; ++i)
    faces[i] = {faces_in[3 * i], faces_in[3 * i + 1], faces_in[3 * i + 2]};
  return qem_core(pos, faces, target_faces, out_verts, out_faces, out_nv,
                  out_nf);
}

// Pre-pass + QEM: same result contract as dsu_decimate, 3-5x faster on
// dense marching-tets meshes.
int dsu_decimate_fast(const float* verts_in, int nv, const int* faces_in,
                      int nf, int target_faces, float* out_verts,
                      int* out_faces, int* out_nv, int* out_nf) {
  std::vector<std::array<double, 3>> pos(nv);
  for (int i = 0; i < nv; ++i)
    pos[i] = {verts_in[3 * i], verts_in[3 * i + 1], verts_in[3 * i + 2]};
  std::vector<std::array<int, 3>> faces(nf);
  for (int i = 0; i < nf; ++i)
    faces[i] = {faces_in[3 * i], faces_in[3 * i + 1], faces_in[3 * i + 2]};
  prepass_collapse(pos, faces, target_faces, /*max_rounds=*/4);
  return qem_core(pos, faces, target_faces, out_verts, out_faces, out_nv,
                  out_nf);
}

}  // extern "C"

namespace {

int qem_core(std::vector<std::array<double, 3>>& pos,
             std::vector<std::array<int, 3>>& faces, int target_faces,
             float* out_verts, int* out_faces, int* out_nv, int* out_nf) {
  const int nv = int(pos.size());
  const int nf = int(faces.size());

  // per-vertex quadrics from incident face planes
  std::vector<Quadric> Q(nv);
  std::vector<std::vector<int>> vfaces(nv);
  for (int fi = 0; fi < nf; ++fi) {
    auto& f = faces[fi];
    auto &p0 = pos[f[0]], &p1 = pos[f[1]], &p2 = pos[f[2]];
    double ux = p1[0] - p0[0], uy = p1[1] - p0[1], uz = p1[2] - p0[2];
    double vx = p2[0] - p0[0], vy = p2[1] - p0[1], vz = p2[2] - p0[2];
    double a = uy * vz - uz * vy, b = uz * vx - ux * vz,
           c = ux * vy - uy * vx;
    double len = std::sqrt(a * a + b * b + c * c);
    if (len < 1e-30) continue;
    a /= len; b /= len; c /= len;
    double d = -(a * p0[0] + b * p0[1] + c * p0[2]);
    for (int k = 0; k < 3; ++k) {
      Q[f[k]].add_plane(a, b, c, d);
      vfaces[f[k]].push_back(fi);
    }
  }

  std::vector<int> gen(nv, 0);
  std::vector<int> parent(nv);
  for (int i = 0; i < nv; ++i) parent[i] = i;
  std::function<int(int)> find = [&](int x) {
    while (parent[x] != x) { parent[x] = parent[parent[x]]; x = parent[x]; }
    return x;
  };

  auto contract_cost = [&](int a, int b, std::array<double, 3>* best) {
    Quadric q = Q[a] + Q[b];
    // candidate positions: midpoint + endpoints (robust, skips 4x4 solve)
    std::array<std::array<double, 3>, 3> cands = {{
        {(pos[a][0] + pos[b][0]) / 2, (pos[a][1] + pos[b][1]) / 2,
         (pos[a][2] + pos[b][2]) / 2},
        pos[a], pos[b]}};
    double bc = 1e300;
    for (auto& c : cands) {
      double e = q.eval(c[0], c[1], c[2]);
      if (e < bc) { bc = e; *best = c; }
    }
    return bc;
  };

  std::priority_queue<Edge, std::vector<Edge>, std::greater<Edge>> heap;
  std::unordered_set<int64_t> seen;
  auto push_edge = [&](int a, int b) {
    if (a == b) return;
    if (a > b) std::swap(a, b);
    std::array<double, 3> best;
    double c = contract_cost(a, b, &best);
    heap.push({c, a, b, gen[a] + gen[b]});
  };
  for (auto& f : faces)
    for (int k = 0; k < 3; ++k) {
      int a = f[k], b = f[(k + 1) % 3];
      int64_t key = int64_t(std::min(a, b)) * nv + std::max(a, b);
      if (seen.insert(key).second) push_edge(a, b);
    }

  int live_faces = nf;
  std::vector<bool> face_dead(nf, false);

  while (live_faces > target_faces && !heap.empty()) {
    Edge e = heap.top();
    heap.pop();
    int a = find(e.v0), b = find(e.v1);
    if (a == b) continue;
    if (gen[a] + gen[b] != e.gen ||
        find(e.v0) != e.v0 || find(e.v1) != e.v1) {
      // stale: re-push with current roots
      if (a != b) push_edge(a, b);
      continue;
    }
    // collapse b into a
    std::array<double, 3> best;
    contract_cost(a, b, &best);
    pos[a] = best;
    Q[a] = Q[a] + Q[b];
    parent[b] = a;
    gen[a]++;
    // merge face lists, kill degenerate faces
    for (int fi : vfaces[b]) vfaces[a].push_back(fi);
    vfaces[b].clear();
    std::vector<int> keep;
    for (int fi : vfaces[a]) {
      if (face_dead[fi]) continue;
      auto& f = faces[fi];
      int r0 = find(f[0]), r1 = find(f[1]), r2 = find(f[2]);
      if (r0 == r1 || r1 == r2 || r0 == r2) {
        face_dead[fi] = true;
        --live_faces;
      } else {
        keep.push_back(fi);
      }
    }
    vfaces[a].swap(keep);
  }

  // compact output
  std::vector<int> remap(nv, -1);
  int nvo = 0;
  for (int fi = 0; fi < nf; ++fi) {
    if (face_dead[fi]) continue;
    for (int k = 0; k < 3; ++k) {
      int r = find(faces[fi][k]);
      if (remap[r] < 0) {
        remap[r] = nvo++;
        out_verts[3 * remap[r]] = float(pos[r][0]);
        out_verts[3 * remap[r] + 1] = float(pos[r][1]);
        out_verts[3 * remap[r] + 2] = float(pos[r][2]);
      }
    }
  }
  int nfo = 0;
  for (int fi = 0; fi < nf; ++fi) {
    if (face_dead[fi]) continue;
    for (int k = 0; k < 3; ++k)
      out_faces[3 * nfo + k] = remap[find(faces[fi][k])];
    ++nfo;
  }
  *out_nv = nvo;
  *out_nf = nfo;
  return 0;
}

}  // extern "C"
