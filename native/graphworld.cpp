// graphworld: native navigation-graph kernels for the TPU-native VLN stack.
//
// Two roles, mirroring the external C++ surface of the reference stack:
//
//  1. All-pairs shortest paths (distance + next-hop) — the world-compiler
//     hot kernel.  The reference does this in Python via networkx
//     (tasks/R2R-judy/src/environ/common_env.py:164-181); here it is a
//     binary-heap Dijkstra from every source, O(V (V+E) log V) per scan.
//
//  2. GraphSim — a discrete navigation state machine reproducing the
//     MatterSim contract the reference actually exercises with rendering
//     disabled and discretized viewing angles (src/utils/misc.py:346-390):
//     newEpisode / makeAction(idx, dh, de) / getState with per-view
//     navigable locations and relative angles.  Used for parity tests of
//     the pure-JAX environment and as the host-loop baseline in bench.py.
//
// Exposed via a C ABI for ctypes (no pybind11 dependency).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <queue>
#include <vector>

namespace {

constexpr float kPi = 3.14159265358979323846f;
constexpr float kAngleInc = kPi / 6.0f;  // 30 degrees

struct World {
  int V;
  std::vector<float> pos;                 // V*3
  std::vector<std::vector<int>> adj;      // sorted neighbor lists
  std::vector<std::vector<float>> w;      // matching edge weights
};

struct SimState {
  const World* world = nullptr;
  int node = 0;
  int heading_idx = 0;   // 0..11, heading = idx * 30deg
  int elev_idx = 1;      // 0 down, 1 level, 2 up
};

struct NavLoc {
  int node;             // -1 for "current location" slot
  float rel_heading;
  float rel_elevation;
  float distance;       // angular distance used for sorting / dedup
};

inline float canonical(float x) {
  return x - 2.0f * kPi * std::round(x / (2.0f * kPi));
}

// Absolute heading (clockwise from +y) and elevation to a neighbor.
inline void geo(const World& w, int src, int dst, float* heading, float* elev) {
  const float dx = w.pos[3 * dst + 0] - w.pos[3 * src + 0];
  const float dy = w.pos[3 * dst + 1] - w.pos[3 * src + 1];
  const float dz = w.pos[3 * dst + 2] - w.pos[3 * src + 2];
  float h = std::atan2(dx, dy);
  if (h < 0) h += 2.0f * kPi;
  *heading = h;
  const float horiz = std::max(std::sqrt(dx * dx + dy * dy), 1e-8f);
  *elev = std::atan2(dz, horiz);
}

// Navigable locations from the current discretized view: slot 0 is the
// current node; then every neighbor whose closest heading column matches
// the camera's heading column, sorted by angular distance from the view
// center (the ordering MatterSim exposes and the reference sweeps).
std::vector<NavLoc> navigable(const SimState& s) {
  const World& w = *s.world;
  std::vector<NavLoc> out;
  out.push_back({-1, 0.f, 0.f, 0.f});
  const float cam_h = s.heading_idx * kAngleInc;
  const float cam_e = (s.elev_idx - 1) * kAngleInc;
  for (int nb : w.adj[s.node]) {
    float h, e;
    geo(w, s.node, nb, &h, &e);
    const int col = ((int)std::lround(h / kAngleInc)) % 12;
    if (col != s.heading_idx) continue;
    const float rh = canonical(h - cam_h);
    const float re = e - cam_e;
    out.push_back({nb, rh, re, std::sqrt(rh * rh + re * re)});
  }
  std::sort(out.begin() + 1, out.end(),
            [](const NavLoc& a, const NavLoc& b) { return a.distance < b.distance; });
  return out;
}

}  // namespace

extern "C" {

// ---------------------------------------------------------------------------
// World lifecycle
// ---------------------------------------------------------------------------

void* gw_world_create(int V, int E, const float* pos, const int* edge_a,
                      const int* edge_b) {
  auto* w = new World();
  w->V = V;
  w->pos.assign(pos, pos + 3 * V);
  w->adj.resize(V);
  w->w.resize(V);
  for (int e = 0; e < E; ++e) {
    const int a = edge_a[e], b = edge_b[e];
    const float dx = pos[3 * a] - pos[3 * b];
    const float dy = pos[3 * a + 1] - pos[3 * b + 1];
    const float dz = pos[3 * a + 2] - pos[3 * b + 2];
    const float d = std::sqrt(dx * dx + dy * dy + dz * dz);
    w->adj[a].push_back(b);
    w->w[a].push_back(d);
    w->adj[b].push_back(a);
    w->w[b].push_back(d);
  }
  for (int v = 0; v < V; ++v) {
    std::vector<int> order(w->adj[v].size());
    for (size_t i = 0; i < order.size(); ++i) order[i] = (int)i;
    std::sort(order.begin(), order.end(),
              [&](int i, int j) { return w->adj[v][i] < w->adj[v][j]; });
    std::vector<int> na;
    std::vector<float> nw;
    int prev = -1;
    for (int i : order) {
      if (w->adj[v][i] == prev) continue;  // dedupe parallel edges
      prev = w->adj[v][i];
      na.push_back(w->adj[v][i]);
      nw.push_back(w->w[v][i]);
    }
    w->adj[v] = std::move(na);
    w->w[v] = std::move(nw);
  }
  return w;
}

void gw_world_destroy(void* handle) { delete static_cast<World*>(handle); }

// ---------------------------------------------------------------------------
// All-pairs shortest paths: dist[V*V], next_hop[V*V]
// ---------------------------------------------------------------------------

void gw_allpairs(void* handle, float* dist_out, int* nexthop_out) {
  const World& w = *static_cast<World*>(handle);
  const int V = w.V;
  const float INF = 1e9f;
  std::vector<float> dist(V);
  std::vector<int> first(V);  // first hop from the source on the best path
  using QE = std::pair<float, int>;

  for (int src = 0; src < V; ++src) {
    std::fill(dist.begin(), dist.end(), INF);
    std::fill(first.begin(), first.end(), src);
    std::priority_queue<QE, std::vector<QE>, std::greater<QE>> pq;
    dist[src] = 0.f;
    pq.push({0.f, src});
    while (!pq.empty()) {
      auto [d, u] = pq.top();
      pq.pop();
      if (d > dist[u]) continue;
      for (size_t i = 0; i < w.adj[u].size(); ++i) {
        const int v = w.adj[u][i];
        const float nd = d + w.w[u][i];
        if (nd < dist[v]) {
          dist[v] = nd;
          first[v] = (u == src) ? v : first[u];
          pq.push({nd, v});
        }
      }
    }
    std::memcpy(dist_out + (size_t)src * V, dist.data(), V * sizeof(float));
    std::memcpy(nexthop_out + (size_t)src * V, first.data(), V * sizeof(int));
  }
}

// ---------------------------------------------------------------------------
// GraphSim: MatterSim-contract state machine
// ---------------------------------------------------------------------------

void* gw_sim_create(void* world_handle) {
  auto* s = new SimState();
  s->world = static_cast<World*>(world_handle);
  return s;
}

void gw_sim_destroy(void* handle) { delete static_cast<SimState*>(handle); }

void gw_sim_new_episode(void* handle, int node, float heading, float elevation) {
  auto* s = static_cast<SimState*>(handle);
  s->node = node;
  s->heading_idx = ((int)std::lround(heading / kAngleInc) % 12 + 12) % 12;
  int e = (int)std::lround(elevation / kAngleInc);
  e = std::max(-1, std::min(1, e));
  s->elev_idx = e + 1;
}

// makeAction(index, heading_chg, elevation_chg): apply view turns (in
// +-30deg increments, matching setDiscretizedViewingAngles), then move to
// navigableLocations[index] if index > 0.  Returns 0 on success.
int gw_sim_make_action(void* handle, int index, float heading_chg,
                       float elevation_chg) {
  auto* s = static_cast<SimState*>(handle);
  const int dh = (int)std::lround(heading_chg / kAngleInc);
  const int de = (int)std::lround(elevation_chg / kAngleInc);
  s->heading_idx = ((s->heading_idx + dh) % 12 + 12) % 12;
  s->elev_idx = std::max(0, std::min(2, s->elev_idx + de));
  if (index > 0) {
    auto locs = navigable(*s);
    if (index >= (int)locs.size()) return 1;
    s->node = locs[index].node;
    // camera keeps its discretized pose after a forward move
  }
  return 0;
}

void gw_sim_get_state(void* handle, int* node, int* view_index, float* heading,
                      float* elevation) {
  auto* s = static_cast<SimState*>(handle);
  *node = s->node;
  *view_index = s->elev_idx * 12 + s->heading_idx;
  *heading = s->heading_idx * kAngleInc;
  *elevation = (s->elev_idx - 1) * kAngleInc;
}

// Fill up to max_locs navigable locations; returns the count.  Row layout:
// [node, rel_heading, rel_elevation] with node = -1 for the current-pose
// slot 0 (the caller knows its own node id).
int gw_sim_navigable(void* handle, int max_locs, int* nodes, float* rel_heading,
                     float* rel_elevation) {
  auto* s = static_cast<SimState*>(handle);
  auto locs = navigable(*s);
  const int n = std::min((int)locs.size(), max_locs);
  for (int i = 0; i < n; ++i) {
    nodes[i] = locs[i].node;
    rel_heading[i] = locs[i].rel_heading;
    rel_elevation[i] = locs[i].rel_elevation;
  }
  return n;
}

}  // extern "C"
