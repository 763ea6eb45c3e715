// Successive-shortest-paths min-cost-flow solver for multi-object tracking.
//
// TPU-framework replacement for the reference's libmot MinCostFlowTracker
// (reference AxonDetections.py:663-696), which wrapped Google OR-Tools'
// C++ SimpleMinCostFlow. Graph layout (Zhang et al. 2008 network-flow MOT):
// per detection i an edge u_i -> v_i with observation cost; source -> u_i
// entry edges; v_i -> sink exit edges; v_i -> u_j transition edges across
// <= max_num_misses+1 frame gaps. All capacities are 1.
//
// The solver augments one unit at a time (each augmentation is optimal for
// its flow value — classic SSP property), so the flow search over
// [min_flow, max_flow] (reference exp_parameters.py:87-88) falls out of a
// single run: marginal path costs are non-decreasing, so we stop at the
// first non-negative marginal cost past min_flow.
//
// Costs are int64 (callers scale float costs by 1e6). Negative edge costs
// (confident detections are rewarded, mincostflow_models.py:23-27) are
// handled with Bellman-Ford-initialized potentials + Dijkstra.

#include <cstdint>
#include <queue>
#include <vector>
#include <limits>

namespace {

constexpr int64_t kInf = std::numeric_limits<int64_t>::max() / 4;

struct Edge {
  int to;
  int cap;
  int64_t cost;
  int rev;  // index of reverse edge in graph[to]
};

struct Graph {
  std::vector<std::vector<Edge>> adj;
  // original edge id -> (node, index in adj[node])
  std::vector<std::pair<int, int>> edge_loc;

  explicit Graph(int n) : adj(n) {}

  void add_edge(int from, int to, int64_t cost) {
    edge_loc.emplace_back(from, (int)adj[from].size());
    adj[from].push_back({to, 1, cost, (int)adj[to].size()});
    adj[to].push_back({from, 0, -cost, (int)adj[from].size() - 1});
  }
};

}  // namespace

extern "C" {

// Solve the tracking MCF.
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
  Graph g(n_nodes);
  for (int e = 0; e < n_edges; ++e) g.add_edge(from[e], to[e], cost[e]);
  const int src = n_nodes - 2, snk = n_nodes - 1;

  // potentials via Bellman-Ford (graph is a DAG in time, converges fast)
  std::vector<int64_t> pot(n_nodes, kInf);
  pot[src] = 0;
  for (int it = 0; it < n_nodes; ++it) {
    bool changed = false;
    for (int u = 0; u < n_nodes; ++u) {
      if (pot[u] == kInf) continue;
      for (const Edge& e : g.adj[u]) {
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
  std::vector<int> prev_node(n_nodes), prev_edge(n_nodes);
  int64_t total_cost = 0;
  int flow = 0;

  while (flow < max_flow) {
    // Dijkstra with potentials
    std::fill(dist.begin(), dist.end(), kInf);
    dist[src] = 0;
    using QE = std::pair<int64_t, int>;
    std::priority_queue<QE, std::vector<QE>, std::greater<QE>> pq;
    pq.push({0, src});
    while (!pq.empty()) {
      auto [d, u] = pq.top();
      pq.pop();
      if (d > dist[u]) continue;
      for (int ei = 0; ei < (int)g.adj[u].size(); ++ei) {
        const Edge& e = g.adj[u][ei];
        if (e.cap <= 0) continue;
        int64_t nd = d + e.cost + pot[u] - pot[e.to];
        if (nd < dist[e.to]) {
          dist[e.to] = nd;
          prev_node[e.to] = u;
          prev_edge[e.to] = ei;
          pq.push({nd, e.to});
        }
      }
    }
    if (dist[snk] >= kInf) break;  // no more augmenting paths

    int64_t path_cost = dist[snk] + pot[snk] - pot[src];
    // convex cost curve: once marginal cost is non-negative and the
    // minimum identity count is reached, adding flow only hurts
    if (flow >= min_flow && path_cost >= 0) break;

    for (int u = 0; u < n_nodes; ++u)
      if (dist[u] < kInf) pot[u] += dist[u];

    // augment 1 unit along the path
    for (int v = snk; v != src; v = prev_node[v]) {
      Edge& e = g.adj[prev_node[v]][prev_edge[v]];
      e.cap -= 1;
      g.adj[v][e.rev].cap += 1;
    }
    total_cost += path_cost;
    ++flow;
  }

  if (flow < min_flow) return -1;

  for (int e = 0; e < n_edges; ++e) {
    auto [u, idx] = g.edge_loc[e];
    flow_out[e] = g.adj[u][idx].cap == 0 ? 1 : 0;
  }
  *total_cost_out = total_cost;
  return flow;
}

}  // extern "C"
