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
    std::vector<Arc> arcs;
    arcs.reserve(2 * n_edges);
    std::vector<int32_t> first(n_nodes, -1);
    auto add_arc = [&](int32_t u, int32_t v, double c) {
        Arc a;
        a.head = v;
        a.next = first[u];
        a.rcap = c;
        first[u] = (int32_t)arcs.size();
        arcs.push_back(a);
    };
    for (int64_t e = 0; e < n_edges; ++e) {
        if (eu[e] < 0 || eu[e] >= n_nodes || ev[e] < 0 || ev[e] >= n_nodes) {
            // keep arc pairing (index ^ 1) intact: skip the whole pair
            continue;
        }
        add_arc((int32_t)eu[e], (int32_t)ev[e], ecap[e]);
        add_arc((int32_t)ev[e], (int32_t)eu[e], erev[e]);
    }
    std::vector<double> tcap(tcap_in, tcap_in + n_nodes);

    // Simple BFS-based augmenting (Edmonds-Karp over the residual graph with
    // terminal capacities folded in). For the meshing graphs (short paths,
    // sparse) this runs close to BK in practice and is dependably correct.
    double flow = 0.0;
    std::vector<int32_t> pred_arc(n_nodes);
    std::vector<uint8_t> visited(n_nodes);

    while (true) {
        // BFS from all source-connected nodes.
        std::fill(visited.begin(), visited.end(), 0);
        std::fill(pred_arc.begin(), pred_arc.end(), -1);
        std::queue<int32_t> q;
        for (int64_t i = 0; i < n_nodes; ++i) {
            if (tcap[i] > 1e-12) {
                q.push((int32_t)i);
                visited[i] = 1;
            }
        }
        int32_t reached = -1;
        while (!q.empty() && reached < 0) {
            int32_t u = q.front();
            q.pop();
            if (tcap[u] < -1e-12) {
                reached = u;
                break;
            }
            for (int32_t ai = first[u]; ai != -1; ai = arcs[ai].next) {
                if (arcs[ai].rcap > 1e-12 && !visited[arcs[ai].head]) {
                    visited[arcs[ai].head] = 1;
                    pred_arc[arcs[ai].head] = ai;
                    q.push(arcs[ai].head);
                    if (tcap[arcs[ai].head] < -1e-12) {
                        reached = arcs[ai].head;
                        break;
                    }
                }
            }
        }
        if (reached < 0) break;

        // Find bottleneck along source -> ... -> reached -> sink.
        double bottleneck = -tcap[reached];
        int32_t x = reached;
        while (pred_arc[x] != -1) {
            bottleneck = std::min(bottleneck, arcs[pred_arc[x]].rcap);
            x = arcs[pred_arc[x] ^ 1].head;
        }
        bottleneck = std::min(bottleneck, tcap[x]);

        // Augment.
        tcap[reached] += bottleneck;  // toward 0 (negative = to-sink)
        x = reached;
        while (pred_arc[x] != -1) {
            arcs[pred_arc[x]].rcap -= bottleneck;
            arcs[pred_arc[x] ^ 1].rcap += bottleneck;
            x = arcs[pred_arc[x] ^ 1].head;
        }
        tcap[x] -= bottleneck;
        flow += bottleneck;
    }

    // Final reachability from remaining sources = source side of min cut.
    std::fill(visited.begin(), visited.end(), 0);
    std::queue<int32_t> q2;
    for (int64_t i = 0; i < n_nodes; ++i) {
        if (tcap[i] > 1e-12) {
            q2.push((int32_t)i);
            visited[i] = 1;
        }
    }
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
