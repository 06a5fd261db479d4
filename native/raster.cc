// Orthographic z-buffer triangle rasterizer with barycentric outputs.
//
// Native replacement for the reference's pytorch3d MeshRasterizer (front-mask
// rendering, instant_nsr/utils/coloring_utils.py:21-40), the per-vertex
// python-mesh-raycast hit tests (coloring_utils.py:91-130, all rays are ±z),
// and the Blender EEVEE passes of the style stage (blender_animation.py) —
// posed vertices come from the JAX skinning path, this rasterizes them.
//
// Outputs per pixel: depth, face id (-1 = background), barycentric coords.
// z_mode selects the closest (min z, front) or farthest (max z, back)
// surface, which also serves the thinning front/back queries.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <vector>

extern "C" {

// verts: (nv, 3) with x, y already in PIXEL coordinates, z arbitrary depth.
// faces: (nf, 3). depth: (h*w), face_id: (h*w), bary: (h*w*3).
void dsu_rasterize(const float* verts, int nv, const int* faces, int nf,
                   int width, int height, int z_mode, float* depth,
                   int* face_id, float* bary) {
  (void)nv;
  const float init_z = z_mode == 0 ? 1e30f : -1e30f;
  for (int i = 0; i < width * height; ++i) {
    depth[i] = init_z;
    face_id[i] = -1;
    bary[3 * i] = bary[3 * i + 1] = bary[3 * i + 2] = 0.f;
  }

  for (int fi = 0; fi < nf; ++fi) {
    const int i0 = faces[3 * fi], i1 = faces[3 * fi + 1],
              i2 = faces[3 * fi + 2];
    const float x0 = verts[3 * i0], y0 = verts[3 * i0 + 1],
                z0 = verts[3 * i0 + 2];
    const float x1 = verts[3 * i1], y1 = verts[3 * i1 + 1],
                z1 = verts[3 * i1 + 2];
    const float x2 = verts[3 * i2], y2 = verts[3 * i2 + 1],
                z2 = verts[3 * i2 + 2];

    const float area = (x1 - x0) * (y2 - y0) - (x2 - x0) * (y1 - y0);
    if (std::fabs(area) < 1e-12f) continue;
    const float inv_area = 1.0f / area;

    int xmin = std::max(0, (int)std::floor(std::min({x0, x1, x2})));
    int xmax = std::min(width - 1, (int)std::ceil(std::max({x0, x1, x2})));
    int ymin = std::max(0, (int)std::floor(std::min({y0, y1, y2})));
    int ymax = std::min(height - 1, (int)std::ceil(std::max({y0, y1, y2})));

    for (int y = ymin; y <= ymax; ++y) {
      const float py = y + 0.5f;
      for (int x = xmin; x <= xmax; ++x) {
        const float px = x + 0.5f;
        float w0 = ((x1 - px) * (y2 - py) - (x2 - px) * (y1 - py)) * inv_area;
        float w1 = ((x2 - px) * (y0 - py) - (x0 - px) * (y2 - py)) * inv_area;
        float w2 = 1.0f - w0 - w1;
        if (w0 < 0.f || w1 < 0.f || w2 < 0.f) continue;
        const float z = w0 * z0 + w1 * z1 + w2 * z2;
        const int idx = y * width + x;
        const bool closer = z_mode == 0 ? (z < depth[idx]) : (z > depth[idx]);
        if (closer) {
          depth[idx] = z;
          face_id[idx] = fi;
          bary[3 * idx] = w0;
          bary[3 * idx + 1] = w1;
          bary[3 * idx + 2] = w2;
        }
      }
    }
  }
  // normalize background depth to 0
  for (int i = 0; i < width * height; ++i)
    if (face_id[i] < 0) depth[i] = 0.f;
}

// Axis-aligned ±z raycast for a batch of query points: for each (x, y) in
// PIXEL space returns the first hit along +z (dir=+1) or −z (dir=−1) whose z
// is beyond z_from. Implemented by rasterizing the query grid is not enough
// for arbitrary points, so this does per-point triangle tests accelerated by
// a uniform grid over (x, y).
void dsu_raycast_z(const float* verts, int nv, const int* faces, int nf,
                   const float* queries /* (nq,3) pixel x,y + z */, int nq,
                   int dir, float* hit_z, int* hit_face) {
  (void)nv;
  // build a coarse grid index over triangle bboxes
  float xmin = 1e30f, xmax = -1e30f, ymin = 1e30f, ymax = -1e30f;
  for (int i = 0; i < nf * 3; ++i) {
    const float* p = verts + 3 * faces[i];
    xmin = std::min(xmin, p[0]); xmax = std::max(xmax, p[0]);
    ymin = std::min(ymin, p[1]); ymax = std::max(ymax, p[1]);
  }
  const int G = 128;
  const float gx = (xmax - xmin) / G + 1e-9f, gy = (ymax - ymin) / G + 1e-9f;
  std::vector<std::vector<int>> cells(G * G);
  auto cell_of = [&](float x, float y, int* cx, int* cy) {
    *cx = std::min(G - 1, std::max(0, (int)((x - xmin) / gx)));
    *cy = std::min(G - 1, std::max(0, (int)((y - ymin) / gy)));
  };
  for (int fi = 0; fi < nf; ++fi) {
    const float* p0 = verts + 3 * faces[3 * fi];
    const float* p1 = verts + 3 * faces[3 * fi + 1];
    const float* p2 = verts + 3 * faces[3 * fi + 2];
    int cx0, cy0, cx1, cy1;
    cell_of(std::min({p0[0], p1[0], p2[0]}), std::min({p0[1], p1[1], p2[1]}),
            &cx0, &cy0);
    cell_of(std::max({p0[0], p1[0], p2[0]}), std::max({p0[1], p1[1], p2[1]}),
            &cx1, &cy1);
    for (int cy = cy0; cy <= cy1; ++cy)
      for (int cx = cx0; cx <= cx1; ++cx)
        cells[cy * G + cx].push_back(fi);
  }

  for (int qi = 0; qi < nq; ++qi) {
    const float qx = queries[3 * qi], qy = queries[3 * qi + 1],
                qz = queries[3 * qi + 2];
    int cx, cy;
    cell_of(qx, qy, &cx, &cy);
    float best = dir > 0 ? 1e30f : -1e30f;
    int best_f = -1;
    for (int fi : cells[cy * G + cx]) {
      const float* p0 = verts + 3 * faces[3 * fi];
      const float* p1 = verts + 3 * faces[3 * fi + 1];
      const float* p2 = verts + 3 * faces[3 * fi + 2];
      const float area = (p1[0] - p0[0]) * (p2[1] - p0[1])
                       - (p2[0] - p0[0]) * (p1[1] - p0[1]);
      if (std::fabs(area) < 1e-12f) continue;
      const float inv = 1.0f / area;
      float w0 = ((p1[0] - qx) * (p2[1] - qy) - (p2[0] - qx) * (p1[1] - qy)) * inv;
      float w1 = ((p2[0] - qx) * (p0[1] - qy) - (p0[0] - qx) * (p2[1] - qy)) * inv;
      float w2 = 1.0f - w0 - w1;
      if (w0 < -1e-6f || w1 < -1e-6f || w2 < -1e-6f) continue;
      const float z = w0 * p0[2] + w1 * p1[2] + w2 * p2[2];
      if (dir > 0) {
        if (z > qz && z < best) { best = z; best_f = fi; }
      } else {
        if (z < qz && z > best) { best = z; best_f = fi; }
      }
    }
    hit_z[qi] = best_f >= 0 ? best : 0.f;
    hit_face[qi] = best_f;
  }
}

}  // extern "C"
