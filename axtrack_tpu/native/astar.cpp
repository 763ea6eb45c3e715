// Grid A* shortest path — parity oracle for the TPU geodesic kernel.
//
// Replaces the reference's pyastar2d dependency (reference utils.py:379:
// pyastar2d.astar_path(weights, source, target, max_path_length); the
// submodule is not vendored). Semantics implemented here, which the JAX
// wavefront kernel (ops/geodesic.py) must match:
//   - 4-connectivity; step cost = weight of the entered cell
//   - weights are 1.0 inside the segmentation mask, 2^16 outside
//     (AxonDetections.py:598), so off-mask cells are effectively
//     impassable under the max_cost cap
//   - search is pruned at g + h > max_cost (max_cost = max_path_length,
//     i.e. 500 px — AxonDetections.py:77)
//   - returned distance = number of nodes on the path incl. both endpoints
//     (the reference takes nnz of the path matrix, AxonDetections.py:736)
//
// Exposed via ctypes (see native/__init__.py).

#include <cstdint>
#include <cstring>
#include <queue>
#include <vector>
#include <cmath>

namespace {

struct QNode {
  float f;
  int idx;
  bool operator<(const QNode& o) const { return f > o.f; }  // min-heap
};

}  // namespace

extern "C" {

// Single-pair A*. Returns path node count (>0) and fills out_path (y,x
// pairs, start..goal) when a path with cost <= max_cost exists; returns -1
// otherwise. out_path must hold 2*(int)(max_cost+2) ints.
int axtpu_astar_path(const float* weights, int h, int w,
                     int sy, int sx, int ty, int tx,
                     float max_cost, int32_t* out_path) {
  if (sy < 0 || sy >= h || sx < 0 || sx >= w ||
      ty < 0 || ty >= h || tx < 0 || tx >= w)
    return -1;
  const int n = h * w;
  std::vector<float> g(n, INFINITY);
  std::vector<int32_t> parent(n, -1);
  std::priority_queue<QNode> open;

  const int start = sy * w + sx, goal = ty * w + tx;
  auto heur = [&](int idx) {
    int y = idx / w, x = idx % w;
    return float(std::abs(y - ty) + std::abs(x - tx));
  };
  g[start] = 0.0f;
  open.push({heur(start), start});

  const int dy[4] = {-1, 1, 0, 0};
  const int dx[4] = {0, 0, -1, 1};

  while (!open.empty()) {
    QNode cur = open.top();
    open.pop();
    if (cur.idx == goal) break;
    int y = cur.idx / w, x = cur.idx % w;
    if (cur.f > g[cur.idx] + heur(cur.idx) + 1e-6f) continue;  // stale
    for (int d = 0; d < 4; ++d) {
      int ny_ = y + dy[d], nx_ = x + dx[d];
      if (ny_ < 0 || ny_ >= h || nx_ < 0 || nx_ >= w) continue;
      int nidx = ny_ * w + nx_;
      float ng = g[cur.idx] + weights[nidx];
      if (ng < g[nidx]) {
        float nf = ng + heur(nidx);
        if (nf > max_cost) continue;  // prune beyond the cap
        g[nidx] = ng;
        parent[nidx] = cur.idx;
        open.push({nf, nidx});
      }
    }
  }
  if (!std::isfinite(g[goal]) || g[goal] > max_cost) return -1;

  // walk back, count nodes
  int count = 0;
  for (int idx = goal; idx != -1; idx = parent[idx]) ++count;
  if (count > int(max_cost)) return -1;  // node count must fit the cap
  int i = count - 1;
  for (int idx = goal; idx != -1; idx = parent[idx], --i) {
    out_path[2 * i] = idx / w;
    out_path[2 * i + 1] = idx % w;
  }
  return count;
}

// Batched pairwise geodesic distances: for each source, one Dijkstra
// (h == manhattan pruned per-target doesn't batch) — here a capped
// multi-target Dijkstra per source. dists_out[i*n_targets+j] = node count
// of the path source i -> target j, or -1 if unreachable within max_cost.
void axtpu_astar_pairwise(const float* weights, int h, int w,
                          const int32_t* src_yx, int n_src,
                          const int32_t* tgt_yx, int n_tgt,
                          float max_cost, int32_t* dists_out) {
  const int n = h * w;
  std::vector<float> g(n);
  const int dy[4] = {-1, 1, 0, 0};
  const int dx[4] = {0, 0, -1, 1};
  for (int s = 0; s < n_src; ++s) {
    std::fill(g.begin(), g.end(), INFINITY);
    std::priority_queue<QNode> open;
    int sy = src_yx[2 * s], sx = src_yx[2 * s + 1];
    if (sy < 0 || sy >= h || sx < 0 || sx >= w) {
      for (int t = 0; t < n_tgt; ++t) dists_out[s * n_tgt + t] = -1;
      continue;
    }
    int start = sy * w + sx;
    g[start] = 0.0f;
    open.push({0.0f, start});
    while (!open.empty()) {
      QNode cur = open.top();
      open.pop();
      if (cur.f > g[cur.idx] + 1e-6f) continue;
      int y = cur.idx / w, x = cur.idx % w;
      for (int d = 0; d < 4; ++d) {
        int ny_ = y + dy[d], nx_ = x + dx[d];
        if (ny_ < 0 || ny_ >= h || nx_ < 0 || nx_ >= w) continue;
        int nidx = ny_ * w + nx_;
        float ng = g[cur.idx] + weights[nidx];
        if (ng <= max_cost && ng < g[nidx]) {
          g[nidx] = ng;
          open.push({ng, nidx});
        }
      }
    }
    for (int t = 0; t < n_tgt; ++t) {
      int ty = tgt_yx[2 * t], tx = tgt_yx[2 * t + 1];
      if (ty < 0 || ty >= h || tx < 0 || tx >= w) {
        dists_out[s * n_tgt + t] = -1;
        continue;
      }
      float gc = g[ty * w + tx];
      int32_t nodes = std::isfinite(gc) ? int32_t(std::lround(gc)) + 1 : -1;
      if (nodes > int(max_cost)) nodes = -1;  // node count must fit the cap
      dists_out[s * n_tgt + t] = nodes;
    }
  }
}

}  // extern "C"
