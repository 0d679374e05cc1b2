// Native runtime kernels for the host-side irregular algorithms.
//
// The TPU compute path is JAX/XLA; these are the CPU-bound framework pieces
// that the reference also keeps native:
//   * union-find track fusion (ref: src/aliceVision/track/TracksBuilder.cpp
//     on lemon's unionfind) — pointer chasing, hot for millions of matches;
//   * Boykov-Kolmogorov max-flow/min-cut (ref:
//     src/aliceVision/fuseCut/MaxFlow_AdjList.hpp on boost BGL) — the
//     graph-cut surface extraction solver.
//
// Exposed with a plain C ABI for ctypes (no pybind11 in this image).

#include <cstdint>
#include <cstring>
#include <queue>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// Union-find with path halving + union by size.
// ---------------------------------------------------------------------------

// nodes: 0..n-1; edges: (a[i], b[i]) pairs. out_root[i] = representative.
void uf_connected_components(const int64_t* a, const int64_t* b,
                             int64_t n_edges, int64_t n_nodes,
                             int64_t* out_root) {
    std::vector<int64_t> parent(n_nodes);
    std::vector<int32_t> size(n_nodes, 1);
    for (int64_t i = 0; i < n_nodes; ++i) parent[i] = i;

    auto find = [&](int64_t x) {
        while (parent[x] != x) {
            parent[x] = parent[parent[x]];  // path halving
            x = parent[x];
        }
        return x;
    };

    for (int64_t e = 0; e < n_edges; ++e) {
        if (a[e] < 0 || a[e] >= n_nodes || b[e] < 0 || b[e] >= n_nodes)
            continue;  // defend the heap against malformed edge lists
        int64_t ra = find(a[e]);
        int64_t rb = find(b[e]);
        if (ra == rb) continue;
        if (size[ra] < size[rb]) std::swap(ra, rb);
        parent[rb] = ra;
        size[ra] += size[rb];
    }
    for (int64_t i = 0; i < n_nodes; ++i) out_root[i] = find(i);
}

// ---------------------------------------------------------------------------
// Boykov-Kolmogorov max-flow (compact adjacency-list implementation).
// Graph: n nodes + implicit source/sink via terminal capacities.
//   tcap[i] > 0: source->i capacity; tcap[i] < 0: i->sink capacity.
//   edges: (u, v, cap, rev_cap) pairs.
// Returns max flow; out_label[i] = 1 if i on the SOURCE side of the cut.
// ---------------------------------------------------------------------------

struct Arc {
    int32_t head;  // target node
    int32_t next;  // next arc index of the same node, -1 end
    double rcap;   // residual capacity
};

double bk_maxflow(int64_t n_nodes, const int64_t* eu, const int64_t* ev,
                  const double* ecap, const double* erev, int64_t n_edges,
                  const double* tcap_in, uint8_t* out_label) {
    // Dinic's algorithm with explicit super-source/super-sink.
    //
    // The previous implementation was Edmonds-Karp with a FULL BFS restart
    // per augmenting path — O(paths x E), measured ~13 min on a 316k-cell
    // meshing graph (the reference's BGL boykov_kolmogorov handles the same
    // in seconds). Dinic does ONE BFS per phase and finds a blocking flow
    // with the current-arc DFS; on these short-path sparse meshing graphs
    // the phase count is tiny, giving near-linear behavior.
    const int64_t S = n_nodes;      // super source
    const int64_t T = n_nodes + 1;  // super sink
    const int64_t N = n_nodes + 2;

    std::vector<Arc> arcs;
    arcs.reserve(2 * (n_edges + n_nodes));
    std::vector<int32_t> first(N, -1);
    auto add_pair = [&](int32_t u, int32_t v, double c, double cr) {
        Arc a;
        a.head = v;
        a.next = first[u];
        a.rcap = c;
        first[u] = (int32_t)arcs.size();
        arcs.push_back(a);
        Arc b;
        b.head = u;
        b.next = first[v];
        b.rcap = cr;
        first[v] = (int32_t)arcs.size();
        arcs.push_back(b);
    };
    for (int64_t e = 0; e < n_edges; ++e) {
        if (eu[e] < 0 || eu[e] >= n_nodes || ev[e] < 0 || ev[e] >= n_nodes)
            continue;  // defend the heap against malformed edge lists
        add_pair((int32_t)eu[e], (int32_t)ev[e], ecap[e], erev[e]);
    }
    for (int64_t i = 0; i < n_nodes; ++i) {
        if (tcap_in[i] > 1e-12)
            add_pair((int32_t)S, (int32_t)i, tcap_in[i], 0.0);
        else if (tcap_in[i] < -1e-12)
            add_pair((int32_t)i, (int32_t)T, -tcap_in[i], 0.0);
    }

    std::vector<int32_t> level(N);
    std::vector<int32_t> it(N);
    std::vector<int32_t> bfs_q(N);

    auto bfs = [&]() -> bool {
        std::fill(level.begin(), level.end(), -1);
        int32_t head = 0, tail = 0;
        bfs_q[tail++] = (int32_t)S;
        level[S] = 0;
        while (head < tail) {
            int32_t u = bfs_q[head++];
            for (int32_t ai = first[u]; ai != -1; ai = arcs[ai].next) {
                int32_t v = arcs[ai].head;
                if (arcs[ai].rcap > 1e-12 && level[v] < 0) {
                    level[v] = level[u] + 1;
                    bfs_q[tail++] = v;
                }
            }
        }
        return level[T] >= 0;
    };

    // Iterative blocking-flow DFS with current-arc pointers.
    std::vector<int32_t> path_arc;
    path_arc.reserve(1024);
    double flow = 0.0;
    while (bfs()) {
        for (int64_t i = 0; i < N; ++i) it[i] = first[i];
        for (;;) {
            // walk from S following admissible current arcs
            path_arc.clear();
            int32_t u = (int32_t)S;
            while (u != (int32_t)T) {
                int32_t ai = it[u];
                while (ai != -1 &&
                       (arcs[ai].rcap <= 1e-12 ||
                        level[arcs[ai].head] != level[u] + 1))
                    ai = arcs[ai].next;
                it[u] = ai;
                if (ai == -1) {
                    // dead end: retreat (or phase done at S)
                    if (path_arc.empty()) {
                        u = -1;
                        break;
                    }
                    level[u] = -1;  // prune exhausted node this phase
                    int32_t pa = path_arc.back();
                    path_arc.pop_back();
                    u = arcs[pa ^ 1].head;  // tail of pa
                    it[u] = arcs[pa].next;  // skip the arc into the dead node
                    continue;
                }
                path_arc.push_back(ai);
                u = arcs[ai].head;
            }
            if (u == -1) break;  // no more augmenting paths this phase
            // bottleneck + augment
            double bn = arcs[path_arc[0]].rcap;
            for (int32_t pa : path_arc) bn = std::min(bn, arcs[pa].rcap);
            for (int32_t pa : path_arc) {
                arcs[pa].rcap -= bn;
                arcs[pa ^ 1].rcap += bn;
            }
            flow += bn;
        }
    }

    // Reachability from S in the residual graph = source side of the cut.
    std::vector<uint8_t> visited(N, 0);
    std::queue<int32_t> q2;
    q2.push((int32_t)S);
    visited[S] = 1;
    while (!q2.empty()) {
        int32_t u = q2.front();
        q2.pop();
        for (int32_t ai = first[u]; ai != -1; ai = arcs[ai].next) {
            if (arcs[ai].rcap > 1e-12 && !visited[arcs[ai].head]) {
                visited[arcs[ai].head] = 1;
                q2.push(arcs[ai].head);
            }
        }
    }
    std::memcpy(out_label, visited.data(), n_nodes);
    return flow;
}

}  // extern "C"
