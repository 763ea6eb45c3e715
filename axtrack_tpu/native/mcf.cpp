// Min-cost-flow solvers for multi-object tracking.
//
// TPU-framework replacement for the reference's libmot MinCostFlowTracker
// (reference AxonDetections.py:663-696), which wrapped Google OR-Tools'
// C++ SimpleMinCostFlow. Graph layout (Zhang et al. 2008 network-flow MOT):
// per detection i an edge u_i -> v_i with observation cost; source -> u_i
// entry edges; v_i -> sink exit edges; v_i -> u_j transition edges across
// <= max_num_misses+1 frame gaps. All capacities are 1.
//
// Semantics (both solvers): over the identity-count range
// [min_flow, max_flow] (reference exp_parameters.py:87-88), return the
// SMALLEST flow value minimizing total cost — i.e. grow flow only while the
// marginal path cost is strictly negative, except that min_flow units are
// forced regardless. Costs are int64 (callers scale float costs by 1e6).
//
// Two implementations:
//  * axtpu_solve_tracking_mcf_ssp — successive shortest paths
//    (Bellman-Ford-seeded potentials + early-exit Dijkstra). One
//    augmentation per unit of flow: ~75 ms on the bench workload
//    (2562 nodes / 5930 edges / 190 identities) — the marginal-cost curve
//    is what terminates the flow search, so every unit pays a Dijkstra.
//  * axtpu_solve_tracking_mcf — Goldberg-Tarjan cost-scaling push-relabel
//    (what OR-Tools' SimpleMinCostFlow runs), ~20x faster on the bench
//    workload. The flow-range search is folded in via a bypass arc
//    source->sink with capacity max_flow-min_flow and cost -1 against
//    real costs scaled by K=max_flow+1: minimizing K*cost(f) + f picks
//    exactly the SSP's answer (smallest f among cost minimizers, zero-
//    marginal units routed to the bypass). Exhaustively fuzz-checked
//    against the SSP oracle (tests/test_native.py).
//
// The MCF solve is the serial host tail of every detect+associate movie;
// at 20 frames the SSP tail was ~40% of the whole single-movie budget.

#include <cstdint>
#include <queue>
#include <vector>
#include <limits>

namespace {

constexpr int64_t kInf = std::numeric_limits<int64_t>::max() / 4;

// ---------------------------------------------------------------------------
// SSP solver (oracle)
// ---------------------------------------------------------------------------

struct Edge {
  int to;
  int cap;
  int64_t cost;
  int rev;  // global CSR index of the reverse edge
};

// CSR residual graph: 2*n_edges directed arcs (forward + reverse).
struct Graph {
  std::vector<int> off;      // n_nodes+1
  std::vector<Edge> arcs;    // 2*n_edges, grouped by tail node
  std::vector<int> edge_loc; // original edge id -> global CSR index

  Graph(int n_nodes, int n_edges, const int32_t* from, const int32_t* to,
        const int64_t* cost)
      : off(n_nodes + 1, 0), arcs(2 * n_edges), edge_loc(n_edges) {
    for (int e = 0; e < n_edges; ++e) {
      ++off[from[e] + 1];
      ++off[to[e] + 1];
    }
    for (int u = 0; u < n_nodes; ++u) off[u + 1] += off[u];
    std::vector<int> fill(off.begin(), off.end() - 1);
    for (int e = 0; e < n_edges; ++e) {
      const int fi = fill[from[e]]++, ri = fill[to[e]]++;
      arcs[fi] = {to[e], 1, cost[e], ri};
      arcs[ri] = {from[e], 0, -cost[e], fi};
      edge_loc[e] = fi;
    }
  }
};

}  // namespace

extern "C" {

// SSP reference implementation; same contract as axtpu_solve_tracking_mcf.
int axtpu_solve_tracking_mcf_ssp(int n_nodes, int n_edges,
                                 const int32_t* from, const int32_t* to,
                                 const int64_t* cost,
                                 int min_flow, int max_flow,
                                 int32_t* flow_out,
                                 int64_t* total_cost_out) {
  Graph g(n_nodes, n_edges, from, to, cost);
  const int src = n_nodes - 2, snk = n_nodes - 1;

  // node sweep order that is topological for the tracking layout: the
  // graph is a DAG in node order [source, 0, 1, ..., sink] (u_i=2i,
  // v_i=2i+1, detections numbered by frame; every edge goes index-forward
  // except from the source), so Bellman-Ford in this order converges in
  // one pass + one verification pass. Arbitrary graphs still converge.
  std::vector<int> order(n_nodes);
  order[0] = src;
  for (int u = 0, k = 1; u < n_nodes; ++u)
    if (u != src) order[k++] = u;

  std::vector<int64_t> pot(n_nodes, kInf);
  pot[src] = 0;
  for (int it = 0; it < n_nodes; ++it) {
    bool changed = false;
    for (int u : order) {
      if (pot[u] == kInf) continue;
      for (int ei = g.off[u]; ei < g.off[u + 1]; ++ei) {
        const Edge& e = g.arcs[ei];
        if (e.cap > 0 && pot[u] + e.cost < pot[e.to]) {
          pot[e.to] = pot[u] + e.cost;
          changed = true;
        }
      }
    }
    if (!changed) break;
  }
  for (auto& p : pot)
    if (p == kInf) p = 0;  // unreachable nodes

  std::vector<int64_t> dist(n_nodes);
  std::vector<int> prev_edge(n_nodes);
  using QE = std::pair<int64_t, int>;
  std::vector<QE> heap;  // reused across phases
  heap.reserve(4 * n_nodes);
  int64_t total_cost = 0;
  int flow = 0;

  while (flow < max_flow) {
    // Dijkstra with potentials, terminating at the sink pop; potentials
    // then advance by min(dist, dist[sink]), which keeps every residual
    // reduced cost non-negative (for (u,v) with rc >= 0: if dist[u] <= D
    // then min(dist[u],D)-min(dist[v],D) >= dist[u]-dist[v] >= -rc; if
    // dist[u] > D the difference is >= 0). The augmenting path lies
    // entirely in the popped (exact-distance) region.
    std::fill(dist.begin(), dist.end(), kInf);
    dist[src] = 0;
    heap.clear();
    heap.push_back({0, src});
    bool reached = false;
    while (!heap.empty()) {
      const auto [d, u] = heap.front();
      std::pop_heap(heap.begin(), heap.end(), std::greater<QE>());
      heap.pop_back();
      if (d > dist[u]) continue;
      if (u == snk) {
        reached = true;
        break;
      }
      const int64_t base = d + pot[u];
      for (int ei = g.off[u]; ei < g.off[u + 1]; ++ei) {
        const Edge& e = g.arcs[ei];
        if (e.cap <= 0) continue;
        const int64_t nd = base + e.cost - pot[e.to];
        if (nd < dist[e.to]) {
          dist[e.to] = nd;
          prev_edge[e.to] = ei;
          heap.push_back({nd, e.to});
          std::push_heap(heap.begin(), heap.end(), std::greater<QE>());
        }
      }
    }
    if (!reached) break;  // no more augmenting paths

    const int64_t path_cost = dist[snk] + pot[snk] - pot[src];
    // convex cost curve: once marginal cost is non-negative and the
    // minimum identity count is reached, adding flow only hurts
    if (flow >= min_flow && path_cost >= 0) break;

    const int64_t D = dist[snk];
    for (int u = 0; u < n_nodes; ++u)
      pot[u] += dist[u] < D ? dist[u] : D;

    // augment 1 unit along the path (prev_edge[v] is the arc into v)
    for (int v = snk; v != src;) {
      Edge& e = g.arcs[prev_edge[v]];
      e.cap -= 1;
      g.arcs[e.rev].cap += 1;
      v = g.arcs[e.rev].to;  // the arc's tail
    }
    total_cost += path_cost;
    ++flow;
  }

  if (flow < min_flow) return -1;

  for (int e = 0; e < n_edges; ++e)
    flow_out[e] = g.arcs[g.edge_loc[e]].cap == 0 ? 1 : 0;
  *total_cost_out = total_cost;
  return flow;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Cost-scaling push-relabel solver
// ---------------------------------------------------------------------------

namespace {

// Paired-arc residual graph with head/next adjacency: arc a's reverse is
// a^1. Caps are int (unit caps + one bypass arc <= max_flow).
struct PairGraph {
  int n;
  std::vector<int> head, nxt, to;
  std::vector<int> cap;
  std::vector<int64_t> cost;

  explicit PairGraph(int n_nodes) : n(n_nodes), head(n_nodes, -1) {}

  int add(int u, int v, int c, int64_t w) {
    const int a = (int)to.size();
    to.push_back(v); cap.push_back(c); cost.push_back(w);
    nxt.push_back(head[u]); head[u] = a;
    to.push_back(u); cap.push_back(0); cost.push_back(-w);
    nxt.push_back(head[v]); head[v] = a + 1;
    return a;
  }
};

// Dinic max-flow, capped at `want` units. Returns units pushed.
struct Dinic {
  PairGraph& g;
  std::vector<int> level, it;
  explicit Dinic(PairGraph& g_) : g(g_), level(g_.n), it(g_.n) {}

  bool bfs(int s, int t) {
    std::fill(level.begin(), level.end(), -1);
    std::queue<int> q;
    level[s] = 0;
    q.push(s);
    while (!q.empty()) {
      const int u = q.front(); q.pop();
      for (int a = g.head[u]; a != -1; a = g.nxt[a])
        if (g.cap[a] > 0 && level[g.to[a]] < 0) {
          level[g.to[a]] = level[u] + 1;
          q.push(g.to[a]);
        }
    }
    return level[t] >= 0;
  }

  int dfs(int u, int t, int f) {
    if (u == t) return f;
    for (int& a = it[u]; a != -1; a = g.nxt[a]) {
      const int v = g.to[a];
      if (g.cap[a] > 0 && level[v] == level[u] + 1) {
        const int d = dfs(v, t, f < g.cap[a] ? f : g.cap[a]);
        if (d > 0) {
          g.cap[a] -= d;
          g.cap[a ^ 1] += d;
          return d;
        }
      }
    }
    return 0;
  }

  int run(int s, int t, int want) {
    int flow = 0;
    while (flow < want && bfs(s, t)) {
      for (int u = 0; u < g.n; ++u) it[u] = g.head[u];
      int f;
      while (flow < want && (f = dfs(s, t, want - flow)) > 0) flow += f;
    }
    return flow;
  }
};

// Goldberg-Tarjan cost-scaling min-cost circulation refinement on an
// existing feasible flow (here: the Dinic F-flow — refinement preserves
// every node's divergence, so the flow value stays F). Potentials are
// __int128: the worst-case bound O(n * sum of phase epsilons) can brush
// the int64 range at large input costs.
struct Scaler {
  PairGraph& g;
  std::vector<__int128> p;
  std::vector<int64_t> excess;
  std::vector<int> cur;
  std::vector<int> active;
  long long work = 0, work_limit;

  explicit Scaler(PairGraph& g_)
      : g(g_), p(g_.n, 0), excess(g_.n, 0), cur(g_.n),
        work_limit(4LL * 1000 * 1000 * 1000) {}

  inline __int128 cp(int a, int u) const {  // reduced cost of arc a from u
    return (__int128)g.cost[a] + p[u] - p[g.to[a]];
  }

  void push(int a, int u, int d) {
    g.cap[a] -= d;
    g.cap[a ^ 1] += d;
    excess[u] -= d;
    const int v = g.to[a];
    if (excess[v] <= 0 && excess[v] + d > 0) active.push_back(v);
    excess[v] += d;
  }

  // One refine pass: make the current flow eps-optimal. Returns false if
  // the work limit tripped (caller falls back to the SSP oracle).
  bool refine(int64_t eps) {
    // saturate every residual arc with negative reduced cost
    for (int u = 0; u < g.n; ++u)
      for (int a = g.head[u]; a != -1; a = g.nxt[a])
        if (g.cap[a] > 0 && cp(a, u) < 0) push(a, u, g.cap[a]);
    for (int u = 0; u < g.n; ++u) cur[u] = g.head[u];

    while (!active.empty()) {
      const int u = active.back();
      active.pop_back();
      // discharge u
      while (excess[u] > 0) {
        if (++work > work_limit) return false;
        int a = cur[u];
        for (; a != -1; a = g.nxt[a]) {
          if (g.cap[a] > 0 && cp(a, u) < 0) {
            push(a, u, excess[u] < g.cap[a] ? (int)excess[u] : g.cap[a]);
            break;
          }
        }
        cur[u] = a;
        if (a == -1) {
          // relabel: drop p[u] so the best residual arc becomes admissible
          __int128 best = std::numeric_limits<__int128>::min();
          for (int b = g.head[u]; b != -1; b = g.nxt[b])
            if (g.cap[b] > 0) {
              const __int128 cand = p[g.to[b]] - g.cost[b];
              if (cand > best) best = cand;
            }
          if (best == std::numeric_limits<__int128>::min()) return false;
          p[u] = best - eps;
          cur[u] = g.head[u];
        }
      }
    }
    return true;
  }

  bool run(int64_t eps0, int alpha) {
    int64_t eps = eps0;
    while (eps > 1) {
      eps = eps / alpha > 1 ? eps / alpha : 1;
      if (!refine(eps)) return false;
    }
    return true;
  }
};

}  // namespace

extern "C" {

// Solve the tracking MCF (cost-scaling; see the header comment).
//   n_nodes: total nodes incl. source (n_nodes-2) and sink (n_nodes-1).
//   edges: arrays of length n_edges (from, to, cost).
//   min_flow/max_flow: identity-count search range.
// Outputs:
//   flow_out[n_edges]: 0/1 flow on each original edge at the chosen flow.
//   Returns achieved flow f* (>= min_flow) or -1 if min_flow infeasible.
//   total_cost_out: total cost at f* (scaled units).
int axtpu_solve_tracking_mcf(int n_nodes, int n_edges,
                             const int32_t* from, const int32_t* to,
                             const int64_t* cost,
                             int min_flow, int max_flow,
                             int32_t* flow_out, int64_t* total_cost_out) {
  if (min_flow > max_flow || max_flow <= 0) {
    if (min_flow > 0) return -1;
    for (int e = 0; e < n_edges; ++e) flow_out[e] = 0;
    *total_cost_out = 0;
    return 0;
  }
  const int src = n_nodes - 2, snk = n_nodes - 1;

  // Scale real costs by K*(n+1): K = max_flow+1 with a cost -1 bypass makes
  // the optimum minimize K*cost(f) + f (smallest f among cost minimizers —
  // the SSP's strictly-negative-marginal rule); the (n+1) factor makes
  // 1-optimality at termination imply exact optimality (integer costs).
  //
  // Overflow guard — the exact inequality, derived from the measured cmax:
  // the only int64 quantities the scaling path produces are the scaled arc
  // costs (magnitude <= cmax*K*NS) and the phase epsilon (eps0 = cmax*K*NS,
  // monotonically shrinking). Potentials and reduced costs are __int128:
  // across all refine phases |p| is bounded by n * sum(phase eps) <=
  // n * eps0 * alpha^2/(alpha-1) < 2^31 * 2^61 * 10 < 2^96, far inside
  // __int128. So the scaling solver is safe exactly when
  //     cmax * K * NS  <=  int64_max / 4
  // (headroom factor 4 = the same kInf convention as the SSP). At the
  // reference's cost_scale=1e6 (cmax ~ 2^24) this admits K*NS up to ~2^37 —
  // e.g. max_flow=450 with ~300k nodes — where the previous K*NS > 2^22
  // guard silently reverted to the SSP beyond ~116 frames at 40 dets/frame.
  const int64_t K = (int64_t)max_flow + 1;
  const int64_t NS = (int64_t)n_nodes + 1;
  int64_t cmax = 1;
  for (int e = 0; e < n_edges; ++e) {
    const int64_t a = cost[e] < 0 ? -cost[e] : cost[e];
    if (a > cmax) cmax = a;
  }
  if (cmax > std::numeric_limits<int64_t>::max() / 4 / (K * NS))
    return axtpu_solve_tracking_mcf_ssp(n_nodes, n_edges, from, to, cost,
                                        min_flow, max_flow, flow_out,
                                        total_cost_out);

  PairGraph g(n_nodes);
  std::vector<int> loc(n_edges);
  for (int e = 0; e < n_edges; ++e)
    loc[e] = g.add(from[e], to[e], 1, cost[e] * K * NS);
  const int bypass_cap = max_flow - min_flow;
  const int bypass = g.add(src, snk, bypass_cap, -NS);

  // feasibility + initial flow: push max_flow units (always possible when
  // min_flow is feasible, since the bypass carries max_flow - min_flow)
  Dinic dinic(g);
  const int F = dinic.run(src, snk, max_flow);
  if (F < max_flow) {
    // the real graph cannot carry min_flow units
    if (min_flow > 0) return -1;
    // min_flow == 0 and bypass_cap == max_flow, so F == max_flow always;
    // unreachable, but keep the SSP as the safety net
    return axtpu_solve_tracking_mcf_ssp(n_nodes, n_edges, from, to, cost,
                                        min_flow, max_flow, flow_out,
                                        total_cost_out);
  }

  Scaler sc(g);
  const int64_t eps0 = cmax * K * NS;
  if (!sc.run(eps0, 8))
    return axtpu_solve_tracking_mcf_ssp(n_nodes, n_edges, from, to, cost,
                                        min_flow, max_flow, flow_out,
                                        total_cost_out);

  int64_t total_cost = 0;
  for (int e = 0; e < n_edges; ++e) {
    flow_out[e] = g.cap[loc[e]] == 0 ? 1 : 0;
    if (flow_out[e]) total_cost += cost[e];
  }
  *total_cost_out = total_cost;
  return max_flow - (bypass_cap - g.cap[bypass]);
}

}  // extern "C"
