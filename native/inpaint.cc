// Telea fast-marching inpainting — native C++ implementation.
//
// TPU-native replacement for the reference's OpenCV dependency
// (1_lama_contour_remover/predict.py:64, cv2.INPAINT_TELEA). Same algorithm
// as drawingspinup_tpu/ops/inpaint.py's numpy fallback; this is the fast
// path, exported with a C ABI for ctypes.
//
// Telea 2004: march the front inward in order of eikonal distance T, filling
// each pixel from its known radius-eps neighborhood with weights
// w = dir * dst * lev.

#include <cmath>
#include <cstdint>
#include <cstring>
#include <queue>
#include <vector>

namespace {

constexpr uint8_t KNOWN = 0, BAND = 1, INSIDE = 2;
constexpr double INF = 1e6;

struct Node {
  double t;
  int y, x;
  // (t, y, x) lexicographic order — matches the Python heapq tie-breaking in
  // ops/inpaint.py so both implementations fill in the identical order.
  bool operator>(const Node& o) const {
    if (t != o.t) return t > o.t;
    if (y != o.y) return y > o.y;
    return x > o.x;
  }
};

inline double solve_eikonal(int y1, int x1, int y2, int x2, int h, int w,
                            const std::vector<double>& T,
                            const std::vector<uint8_t>& flags) {
  double t1 = INF, t2 = INF;
  if (y1 >= 0 && y1 < h && x1 >= 0 && x1 < w && flags[y1 * w + x1] != INSIDE)
    t1 = T[y1 * w + x1];
  if (y2 >= 0 && y2 < h && x2 >= 0 && x2 < w && flags[y2 * w + x2] != INSIDE)
    t2 = T[y2 * w + x2];
  if (t1 > t2) std::swap(t1, t2);
  if (t1 >= INF) return INF;
  if (t2 - t1 >= 1.0) return t1 + 1.0;
  double d = 2.0 - (t1 - t2) * (t1 - t2);
  if (d <= 0.0) return INF;
  return 0.5 * (t1 + t2 + std::sqrt(d));
}

inline double grad_t(const std::vector<double>& T,
                     const std::vector<uint8_t>& flags, int y, int x,
                     int axis, int h, int w) {
  int ly = y, lx = x, hy = y, hx = x;
  if (axis == 0) { ly = y - 1; hy = y + 1; } else { lx = x - 1; hx = x + 1; }
  bool has_lo = ly >= 0 && ly < h && lx >= 0 && lx < w &&
                flags[ly * w + lx] != INSIDE;
  bool has_hi = hy >= 0 && hy < h && hx >= 0 && hx < w &&
                flags[hy * w + hx] != INSIDE;
  if (has_lo && has_hi) return (T[hy * w + hx] - T[ly * w + lx]) * 0.5;
  if (has_hi) return T[hy * w + hx] - T[y * w + x];
  if (has_lo) return T[y * w + x] - T[ly * w + lx];
  return 0.0;
}

}  // namespace

extern "C" {

// img: (h, w, c) float32, modified in place. mask: (h, w) uint8, nonzero =
// inpaint region. radius: neighborhood radius (reference uses 3).
void dsu_telea_inpaint(float* img, const uint8_t* mask, int h, int w, int c,
                       int radius) {
  const int n = h * w;
  std::vector<uint8_t> flags(n);
  std::vector<double> T(n);
  for (int i = 0; i < n; ++i) {
    bool inside = mask[i] != 0;
    flags[i] = inside ? INSIDE : KNOWN;
    T[i] = inside ? INF : 0.0;
  }

  std::priority_queue<Node, std::vector<Node>, std::greater<Node>> heap;
  for (int y = 0; y < h; ++y)
    for (int x = 0; x < w; ++x) {
      int i = y * w + x;
      if (flags[i] != KNOWN) continue;
      bool border = (y > 0 && flags[i - w] == INSIDE) ||
                    (y + 1 < h && flags[i + w] == INSIDE) ||
                    (x > 0 && flags[i - 1] == INSIDE) ||
                    (x + 1 < w && flags[i + 1] == INSIDE);
      if (border) {
        flags[i] = BAND;
        heap.push({0.0, y, x});
      }
    }

  // precompute disc offsets
  std::vector<std::pair<int, int>> nb;
  for (int dy = -radius; dy <= radius; ++dy)
    for (int dx = -radius; dx <= radius; ++dx)
      if ((dy || dx) && dy * dy + dx * dx <= radius * radius)
        nb.emplace_back(dy, dx);

  const int offs[4][2] = {{-1, 0}, {1, 0}, {0, -1}, {0, 1}};
  const double eps = 1e-6;
  std::vector<double> acc(c);

  while (!heap.empty()) {
    Node cur = heap.top();
    heap.pop();
    int y = cur.y, x = cur.x, i = y * w + x;
    if (flags[i] == KNOWN) continue;
    flags[i] = KNOWN;
    for (auto& off : offs) {
      int qy = y + off[0], qx = x + off[1];
      if (qy < 0 || qy >= h || qx < 0 || qx >= w) continue;
      int qi = qy * w + qx;
      if (flags[qi] != INSIDE) continue;

      double tq = std::min(
          std::min(solve_eikonal(qy - 1, qx, qy, qx - 1, h, w, T, flags),
                   solve_eikonal(qy + 1, qx, qy, qx + 1, h, w, T, flags)),
          std::min(solve_eikonal(qy - 1, qx, qy, qx + 1, h, w, T, flags),
                   solve_eikonal(qy + 1, qx, qy, qx - 1, h, w, T, flags)));
      T[qi] = tq;

      double gy = grad_t(T, flags, qy, qx, 0, h, w);
      double gx = grad_t(T, flags, qy, qx, 1, h, w);
      double wsum = 0.0;
      std::fill(acc.begin(), acc.end(), 0.0);
      for (auto& d : nb) {
        int py = qy + d.first, px = qx + d.second;
        if (py < 0 || py >= h || px < 0 || px >= w) continue;
        int pi = py * w + px;
        if (flags[pi] != KNOWN) continue;
        double vy = qy - py, vx = qx - px;
        double dist2 = vy * vy + vx * vx;
        double dir = std::fabs(vy * gy + vx * gx) / (std::sqrt(dist2) + eps);
        if (dir < eps) dir = eps;
        double dst = 1.0 / (dist2 * std::sqrt(dist2) + eps);
        double lev = 1.0 / (1.0 + std::fabs(T[pi] - tq));
        double wgt = dir * dst * lev;
        wsum += wgt;
        const float* src = img + pi * c;
        for (int k = 0; k < c; ++k) acc[k] += wgt * src[k];
      }
      if (wsum > 0.0) {
        float* dst_px = img + qi * c;
        for (int k = 0; k < c; ++k) dst_px[k] = float(acc[k] / wsum);
      }
      flags[qi] = BAND;
      heap.push({tq, qy, qx});
    }
  }
}

}  // extern "C"
