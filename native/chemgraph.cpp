// Native graph-builder for the chemistry oracle hot path.
//
// The reference delegates molecule building to OpenBabel/RDKit C++ through
// temp files (molecule_builder.py:58-97); here the equivalent native layer
// is a small self-contained library exposing:
//   - find_rings:      BFS smallest-set-of-smallest-rings (same algorithm
//                      as diffndm_tpu/chem/rings.py, ~100x faster)
//   - connectivity:    batched distance-table bond connectivity
// via a C ABI consumed through ctypes (no pybind11 in this image).
//
// Build: g++ -O3 -march=native -fopenmp -shared -fPIC chemgraph.cpp
//            -o libchemgraph.so

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <deque>
#include <set>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

struct Graph {
    int n;
    std::vector<std::vector<int>> adj;
};

// Iteratively trim degree<=1 nodes; remaining core carries every ring.
std::vector<char> core_nodes(const Graph& g) {
    std::vector<int> deg(g.n);
    std::deque<int> q;
    std::vector<char> removed(g.n, 0);
    for (int i = 0; i < g.n; ++i) {
        deg[i] = (int)g.adj[i].size();
        if (deg[i] <= 1) q.push_back(i);
    }
    while (!q.empty()) {
        int u = q.front();
        q.pop_front();
        if (removed[u]) continue;
        removed[u] = 1;
        for (int v : g.adj[u]) {
            if (!removed[v] && --deg[v] <= 1) q.push_back(v);
        }
    }
    std::vector<char> core(g.n, 0);
    for (int i = 0; i < g.n; ++i) core[i] = !removed[i];
    return core;
}

// Smallest simple cycle through root within the core (BFS meet-in-tree).
std::vector<int> smallest_ring_through(int root, const std::vector<char>& core,
                                       const Graph& g) {
    std::vector<int> parent(g.n, -2), depth(g.n, 0);
    parent[root] = -1;
    std::deque<int> q{root};
    std::vector<int> best;
    while (!q.empty()) {
        int u = q.front();
        q.pop_front();
        for (int v : g.adj[u]) {
            if (!core[v]) continue;
            if (parent[v] == -2) {
                parent[v] = u;
                depth[v] = depth[u] + 1;
                q.push_back(v);
            } else if (parent[u] != v && parent[v] != u) {
                // reconstruct both root paths
                std::vector<int> pu, pv;
                for (int a = u; a != -1; a = parent[a]) pu.push_back(a);
                for (int b = v; b != -1; b = parent[b]) pv.push_back(b);
                // paths must share only the root
                std::set<int> su(pu.begin(), pu.end());
                int common = 0;
                for (int b : pv)
                    if (su.count(b)) ++common;
                if (common != 1) continue;
                if (pu.back() != pv.back()) continue;
                std::vector<int> ring(pu);
                for (int k = (int)pv.size() - 2; k >= 0; --k)
                    ring.push_back(pv[k]);
                if (best.empty() || ring.size() < best.size()) best = ring;
            }
        }
        if (!best.empty() && depth[u] > (int)best.size()) break;
    }
    return best;
}

}  // namespace

extern "C" {

// Rings of a single graph.
//   edges: [m*2] node-index pairs
//   out_rings: [max_rings * max_len] ring atom indices (-1 padded)
//   out_sizes: [max_rings]
// Returns the number of rings written.
int cg_find_rings(int n, int m, const int32_t* edges, int32_t* out_rings,
                  int32_t* out_sizes, int max_rings, int max_len) {
    Graph g{n, std::vector<std::vector<int>>(n)};
    for (int e = 0; e < m; ++e) {
        int i = edges[2 * e], j = edges[2 * e + 1];
        g.adj[i].push_back(j);
        g.adj[j].push_back(i);
    }
    auto core = core_nodes(g);
    int n_core = 0, e_core = 0;
    for (int i = 0; i < n; ++i) n_core += core[i];
    if (!n_core) return 0;
    for (int e = 0; e < m; ++e)
        if (core[edges[2 * e]] && core[edges[2 * e + 1]]) ++e_core;
    // components of the core
    std::vector<char> seen(n, 0);
    int n_comp = 0;
    for (int s = 0; s < n; ++s) {
        if (!core[s] || seen[s]) continue;
        ++n_comp;
        std::deque<int> st{s};
        seen[s] = 1;
        while (!st.empty()) {
            int u = st.back();
            st.pop_back();
            for (int v : g.adj[u])
                if (core[v] && !seen[v]) {
                    seen[v] = 1;
                    st.push_back(v);
                }
        }
    }
    int n_rings = e_core - n_core + n_comp;
    if (n_rings <= 0) return 0;

    std::set<std::set<int>> cand_sets;
    std::vector<std::vector<int>> rings;
    for (int v = 0; v < n; ++v) {
        if (!core[v]) continue;
        auto ring = smallest_ring_through(v, core, g);
        if (ring.empty()) continue;
        std::set<int> key(ring.begin(), ring.end());
        if (cand_sets.insert(key).second) rings.push_back(ring);
    }
    std::stable_sort(rings.begin(), rings.end(),
                     [](const std::vector<int>& a, const std::vector<int>& b) {
                         return a.size() < b.size();
                     });
    // greedy edge-coverage independence, then fill to the cyclomatic count
    std::set<std::pair<int, int>> covered;
    std::vector<int> chosen;
    auto ring_edges = [](const std::vector<int>& r) {
        std::vector<std::pair<int, int>> es;
        for (size_t k = 0; k < r.size(); ++k) {
            int a = r[k], b = r[(k + 1) % r.size()];
            es.push_back({std::min(a, b), std::max(a, b)});
        }
        return es;
    };
    for (size_t ri = 0; ri < rings.size() && (int)chosen.size() < n_rings;
         ++ri) {
        bool fresh = false;
        for (auto& e : ring_edges(rings[ri]))
            if (!covered.count(e)) fresh = true;
        if (fresh) {
            chosen.push_back((int)ri);
            for (auto& e : ring_edges(rings[ri])) covered.insert(e);
        }
    }
    for (size_t ri = 0; ri < rings.size() && (int)chosen.size() < n_rings;
         ++ri) {
        bool already = false;
        for (int c : chosen)
            if (c == (int)ri) already = true;
        if (!already) chosen.push_back((int)ri);
    }

    int written = 0;
    for (int c : chosen) {
        if (written >= max_rings) break;
        const auto& r = rings[c];
        if ((int)r.size() > max_len) continue;
        out_sizes[written] = (int)r.size();
        for (size_t k = 0; k < r.size(); ++k)
            out_rings[written * max_len + k] = r[k];
        for (int k = (int)r.size(); k < max_len; ++k)
            out_rings[written * max_len + k] = -1;
        ++written;
    }
    return written;
}

// Batched distance-table connectivity: order 1 wherever
// dist_pm < bonds1 + margin (and bonds1 > 0).  coords in Angstrom.
// NOTE: this is the EDM-table rule (kept as a generic parity utility;
// only tests use it) — NOT the production perception, which follows
// OpenBabel's ConnectTheDots (chemscore.cpp::perceive,
// chem/bonds.py::perceive_molecule).
//   coords [B*N*3], types [B*N], mask [B*N], b1 [T*T]
//   out_conn [B*N*N] uint8
void cg_connectivity(const float* coords, const int32_t* types,
                     const uint8_t* mask, int B, int N, int T,
                     const float* b1, float margin, uint8_t* out_conn) {
#ifdef _OPENMP
#pragma omp parallel for schedule(dynamic)
#endif
    for (int b = 0; b < B; ++b) {
        const float* xc = coords + (size_t)b * N * 3;
        const int32_t* tc = types + (size_t)b * N;
        const uint8_t* mc = mask + (size_t)b * N;
        uint8_t* oc = out_conn + (size_t)b * N * N;
        std::memset(oc, 0, (size_t)N * N);
        for (int i = 0; i < N; ++i) {
            if (!mc[i]) continue;
            for (int j = i + 1; j < N; ++j) {
                if (!mc[j]) continue;
                float dx = xc[i * 3] - xc[j * 3];
                float dy = xc[i * 3 + 1] - xc[j * 3 + 1];
                float dz = xc[i * 3 + 2] - xc[j * 3 + 2];
                float d = std::sqrt(dx * dx + dy * dy + dz * dz) * 100.0f;
                float thr = b1[tc[i] * T + tc[j]];
                if (thr > 0.0f && d < thr + margin) {
                    oc[i * N + j] = 1;
                    oc[j * N + i] = 1;
                }
            }
        }
    }
}

int cg_version() { return 1; }

}  // extern "C"
