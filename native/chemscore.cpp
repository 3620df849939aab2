// Native chemistry oracle: full reward scoring for generated point clouds.
//
// Port of the Python scoring path used by guidance
// (diffndm_tpu/guidance/oracle.py::_score_one):
//   perceive_molecule (chem/bonds.py)  -> sanitize (chem/sanitize.py)
//   -> QED / SA / LogP / Lipinski (chem/properties.py, chem/descriptors.py,
//      chem/morgan.py)
// The reference runs this via OpenBabel temp files + RDKit C++ per molecule
// (molecule_builder.py:58-136, analysis/metrics.py:136-179,
// analysis/SA_Score/sascorer.py); here it is one C call per candidate
// population.  Semantics must match the Python implementation exactly —
// the Python stack remains the reference implementation and fallback, and
// tests/test_native_oracle.py pins equality on thousands of molecules.
//
// Determinism note: aromatic kekulization needs a maximum-cardinality
// matching.  Python uses networkx's blossom; this file implements its own
// deterministic blossom and exports it (cg_max_matching) so the Python
// perception path can share the exact same matching choices when the
// native library is available.

#include <algorithm>
#include <array>
#include <cfenv>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <map>
#include <set>
#include <utility>
#include <vector>

extern "C" int cg_find_rings(int n, int m, const int32_t* edges,
                             int32_t* out_rings, int32_t* out_sizes,
                             int max_rings, int max_len);

namespace {

// element codes (fixed ABI with diffndm_tpu/chem/native.py)
enum Elem { EL_C = 0, EL_N, EL_O, EL_S, EL_B, EL_BR, EL_CL, EL_P, EL_I,
            EL_F, EL_OTHER };
const int N_ELEM = 11;

// ALLOWED_BONDS (constants.py): max allowed valence; -1 = invalid element
const int ALLOWED_MAX[N_ELEM] = {4, 3, 2, 4, 3, 1, 1, 5, 1, 1, -1};
// _EXTRA_VALENCE (mol.py): N->3 (no-op), P handled via tuple max above,
// S->6.  valence_ok: v <= allowed_max or v <= extra.
const int EXTRA_VALENCE[N_ELEM] = {0, 3, 0, 6, 0, 0, 0, 0, 0, 0, 0};
// _ORGANIC_DEFAULT_VALENCE (mol.py)
const int DEFAULT_VALENCE[N_ELEM] = {4, 3, 2, 2, 3, 1, 1, 3, 1, 1, 0};
// _VALENCE_LADDERS: P (3,5), S (2,4,6)
// MONOISOTOPIC_MASS (constants.py)
const double MASS[N_ELEM] = {12.0, 14.0030740, 15.9949146, 31.97207117,
                             11.00930536, 78.9183376, 34.96885268,
                             30.97376199, 126.9044719, 18.9984032, 0.0};
const double MASS_H = 1.00782503;
// ATOMIC_NUMBER
const int ATOMIC_NUM[N_ELEM] = {6, 7, 8, 16, 5, 35, 17, 15, 53, 9, 0};

// _max_valence for the perception cap (bonds.py:54): max(ALLOWED tuple)
const double PERCEIVE_CAP[N_ELEM] = {4, 3, 2, 4, 3, 1, 1, 5, 1, 1, 0};

// OpenBabel element.txt single-bond covalent radii (pm) and maximum bond
// counts (OB_COVALENT_RADII / OB_MAX_BONDS in constants.py), indexed by
// Elem: connectivity follows the reference's default OpenBabel builder
// (ConnectTheDots, molecule_builder.py:58-97): bond when
// d < rcov_i + rcov_j + 45 pm (d > 40 pm), over-coordinated atoms drop
// their longest bonds.  EL_OTHER carries placeholder values (77 pm / 4)
// but never reaches scoring: rows containing a type outside this ABI
// are routed to the Python fallback by NativeScorer (chem/native.py),
// where the real per-element OB radii apply.
const double OB_RCOV[N_ELEM] = {76, 71, 66, 105, 84, 120, 102, 107, 139,
                                57, 77};
const int OB_MAXB[N_ELEM] = {4, 4, 2, 6, 4, 1, 1, 6, 3, 1, 4};

const double MARGIN1 = 3.0, MARGIN2 = 2.0, MARGIN3 = 1.0;

struct Mol {
    int n = 0;
    std::vector<int> elem;                       // element codes
    std::vector<std::array<int, 3>> bonds;       // (i, j, order), i<j order
    std::vector<std::vector<int>> nbr;           // bond-list order
    std::vector<int8_t> adj;                     // n*n orders
    std::vector<int> ih;                         // implicit hydrogens
    std::vector<int> bos;                        // bond order sums
    std::vector<std::vector<int>> rings;         // SSSR
    std::vector<char> ring_member;
    std::vector<std::vector<int>> arom_rings;    // Hueckel-aromatic rings
    std::vector<char> arom_atom;
    int ord(int i, int j) const { return adj[(size_t)i * n + j]; }
};

// ---------------------------------------------------------------------
// deterministic maximum-cardinality matching (blossom algorithm, O(V^3))
// ---------------------------------------------------------------------
struct Blossom {
    int n;
    std::vector<std::vector<int>> g;
    std::vector<int> match, p, base;
    std::vector<char> used, blossom;

    explicit Blossom(int n_) : n(n_), g(n_), match(n_, -1), p(n_),
                               base(n_), used(n_), blossom(n_) {}

    void add_edge(int u, int v) { g[u].push_back(v); g[v].push_back(u); }

    int lca(int a, int b) {
        std::vector<char> used2(n, 0);
        for (;;) {
            a = base[a];
            used2[a] = 1;
            if (match[a] == -1) break;
            a = p[match[a]];
        }
        for (;;) {
            b = base[b];
            if (used2[b]) return b;
            b = p[match[b]];
        }
    }

    void mark_path(int v, int b, int child) {
        while (base[v] != b) {
            blossom[base[v]] = 1;
            blossom[base[match[v]]] = 1;
            p[v] = child;
            child = match[v];
            v = p[match[v]];
        }
    }

    int find_path(int root) {
        std::fill(used.begin(), used.end(), 0);
        std::fill(p.begin(), p.end(), -1);
        for (int i = 0; i < n; ++i) base[i] = i;
        used[root] = 1;
        std::vector<int> q{root};
        for (size_t qi = 0; qi < q.size(); ++qi) {
            int v = q[qi];
            for (int to : g[v]) {
                if (base[v] == base[to] || match[v] == to) continue;
                if (to == root || (match[to] != -1 && p[match[to]] != -1)) {
                    int curbase = lca(v, to);
                    std::fill(blossom.begin(), blossom.end(), 0);
                    mark_path(v, curbase, to);
                    mark_path(to, curbase, v);
                    for (int i = 0; i < n; ++i)
                        if (blossom[base[i]]) {
                            base[i] = curbase;
                            if (!used[i]) { used[i] = 1; q.push_back(i); }
                        }
                } else if (p[to] == -1) {
                    p[to] = v;
                    if (match[to] == -1) return to;
                    used[match[to]] = 1;
                    q.push_back(match[to]);
                }
            }
        }
        return -1;
    }

    int solve() {
        int res = 0;
        for (int v = 0; v < n; ++v) {
            if (match[v] != -1) continue;
            int u = find_path(v);
            if (u == -1) continue;
            ++res;
            while (u != -1) {
                int pv = p[u], ppv = match[pv];
                match[u] = pv;
                match[pv] = u;
                u = ppv;
            }
        }
        return res;
    }
};

// ---------------------------------------------------------------------
// rings via the shared SSSR finder
// ---------------------------------------------------------------------
void find_rings(Mol& m) {
    const int MAXR = 64, MAXL = 32;
    std::vector<int32_t> edges;
    edges.reserve(m.bonds.size() * 2);
    for (auto& b : m.bonds) { edges.push_back(b[0]); edges.push_back(b[1]); }
    std::vector<int32_t> out_r(MAXR * MAXL), out_s(MAXR);
    int k = cg_find_rings(m.n, (int)m.bonds.size(),
                          edges.empty() ? (const int32_t*)nullptr
                                        : edges.data(),
                          out_r.data(), out_s.data(), MAXR, MAXL);
    m.rings.clear();
    m.ring_member.assign(m.n, 0);
    for (int r = 0; r < k; ++r) {
        std::vector<int> ring(out_r.begin() + r * MAXL,
                              out_r.begin() + r * MAXL + out_s[r]);
        for (int a : ring) m.ring_member[a] = 1;
        m.rings.push_back(std::move(ring));
    }
}

// implicit H (mol.py:110-133), neutral atoms only (generated point clouds
// carry no formal charges)
void compute_implicit_h(Mol& m) {
    m.bos.assign(m.n, 0);
    for (auto& b : m.bonds) { m.bos[b[0]] += b[2]; m.bos[b[1]] += b[2]; }
    m.ih.assign(m.n, 0);
    for (int i = 0; i < m.n; ++i) {
        int e = m.elem[i];
        int dv = DEFAULT_VALENCE[e];
        if (e == EL_OTHER) { m.ih[i] = 0; continue; }
        int b = m.bos[i];
        if (b > dv) {
            if (e == EL_P) { if (b <= 5) dv = 5; }
            else if (e == EL_S) { if (b <= 4) dv = 4; else if (b <= 6) dv = 6; }
        }
        m.ih[i] = std::max(0, dv - b);
    }
}

// aromatic rings (mol.py:188-232): simplified Hueckel over the SSSR
void compute_aromatic(Mol& m) {
    m.arom_rings.clear();
    m.arom_atom.assign(m.n, 0);
    for (auto& ring : m.rings) {
        if (ring.size() < 5 || ring.size() > 7) continue;
        int pi = 0;
        bool ok = true;
        for (int a : ring) {
            bool has_double = false, has_triple = false;
            for (int j : m.nbr[a]) {
                int o = m.ord(a, j);
                if (o == 2) has_double = true;
                if (o == 3) has_triple = true;
            }
            if (has_triple) { ok = false; break; }
            int e = m.elem[a];
            int deg_h = (int)m.nbr[a].size() + m.ih[a];
            int c = -1;
            if (e == EL_C) {
                c = has_double ? 1 : -1;
            } else if (e == EL_N || e == EL_P) {
                if (has_double) c = 1;
                else if (deg_h <= 3) c = 2;
            } else if (e == EL_O || e == EL_S) {
                c = has_double ? 1 : 2;
            }
            if (c < 0) { ok = false; break; }
            pi += c;
        }
        if (ok && pi % 4 == 2) {
            m.arom_rings.push_back(ring);
            for (int a : ring) m.arom_atom[a] = 1;
        }
    }
}

// ---------------------------------------------------------------------
// bond perception (bonds.py::perceive_molecule), double precision like
// the numpy path
// ---------------------------------------------------------------------
bool perceive(const double* xyz, const int32_t* types, int n, int T,
              const double* b1, const double* b2, const double* b3,
              const int32_t* elem_codes, Mol& m) {
    m.n = n;
    m.elem.resize(n);
    for (int i = 0; i < n; ++i) m.elem[i] = elem_codes[types[i]];

    std::vector<double> d((size_t)n * n, 0.0);
    for (int i = 0; i < n; ++i)
        for (int j = 0; j < n; ++j) {
            double dx = xyz[i * 3] - xyz[j * 3];
            double dy = xyz[i * 3 + 1] - xyz[j * 3 + 1];
            double dz = xyz[i * 3 + 2] - xyz[j * 3 + 2];
            d[(size_t)i * n + j] = std::sqrt(dx * dx + dy * dy + dz * dz)
                                   * 100.0;
        }
    auto B1 = [&](int i, int j) { return b1[(size_t)types[i] * T + types[j]]; };
    auto B2 = [&](int i, int j) { return b2[(size_t)types[i] * T + types[j]]; };
    auto B3 = [&](int i, int j) { return b3[(size_t)types[i] * T + types[j]]; };

    // 1) connectivity: OpenBabel ConnectTheDots rule + longest-bond
    // pruning, mirroring bonds.py step 1 exactly (smallest over-cap atom
    // index first; first-max neighbour on distance ties = numpy argmax)
    std::vector<uint8_t> conn((size_t)n * n, 0);
    for (int i = 0; i < n; ++i)
        for (int j = i + 1; j < n; ++j) {
            double dij = d[(size_t)i * n + j];
            double thr = OB_RCOV[m.elem[i]] + OB_RCOV[m.elem[j]] + 45.0;
            if (dij < thr && dij > 40.0) {
                conn[(size_t)i * n + j] = 1;
                conn[(size_t)j * n + i] = 1;
            }
        }
    {
        std::vector<int> degc(n, 0);
        for (int i = 0; i < n; ++i)
            for (int j = 0; j < n; ++j) degc[i] += conn[(size_t)i * n + j];
        for (;;) {
            int a = -1;
            for (int i = 0; i < n; ++i)
                if (degc[i] > OB_MAXB[m.elem[i]]) { a = i; break; }
            if (a < 0) break;
            int jbest = -1;
            double dbest = -1.0;
            for (int j = 0; j < n; ++j)
                if (conn[(size_t)a * n + j] &&
                    d[(size_t)a * n + j] > dbest) {
                    dbest = d[(size_t)a * n + j];
                    jbest = j;
                }
            conn[(size_t)a * n + jbest] = 0;
            conn[(size_t)jbest * n + a] = 0;
            --degc[a];
            --degc[jbest];
        }
    }
    std::vector<std::pair<int, int>> edges;
    for (int i = 0; i < n; ++i)
        for (int j = i + 1; j < n; ++j)
            if (conn[(size_t)i * n + j]) edges.push_back({i, j});
    std::map<std::pair<int, int>, int> order;
    std::vector<double> used(n, 0.0);
    std::vector<int> deg(n, 0);
    for (auto& e : edges) {
        order[e] = 1;
        used[e.first] += 1; used[e.second] += 1;
        deg[e.first] += 1; deg[e.second] += 1;
    }
    std::vector<double> cap(n);
    for (int i = 0; i < n; ++i) cap[i] = PERCEIVE_CAP[m.elem[i]];

    // rings on the connectivity graph
    {
        Mol tmp;
        tmp.n = n;
        tmp.bonds.clear();
        for (auto& e : edges) tmp.bonds.push_back({e.first, e.second, 1});
        find_rings(tmp);
        // the final bond list has the same edge set, so the SSSR (and
        // ring membership) carries over unchanged
        m.rings = tmp.rings;
        m.ring_member = tmp.ring_member;
    }

    // 2) aromatic-window detection + kekulization (bonds.py:93-141)
    std::set<std::pair<int, int>> arom_edges;
    std::set<int> arom_atoms;
    for (auto& ring : m.rings) {
        if (ring.size() < 5 || ring.size() > 7) continue;
        std::set<int> rs(ring.begin(), ring.end());
        std::vector<std::pair<int, int>> ring_edges;
        for (auto& e : edges)
            if (rs.count(e.first) && rs.count(e.second))
                ring_edges.push_back(e);
        if (ring_edges.size() != ring.size()) continue;
        bool ok = true;
        for (int a : ring) {
            int e = m.elem[a];
            if (!(e == EL_C || e == EL_N || e == EL_O || e == EL_S)
                || deg[a] > 3) { ok = false; break; }
        }
        if (!ok) continue;
        int n_arom = 0;
        for (auto& e : ring_edges) {
            int i = e.first, j = e.second;
            if (B2(i, j) > 0 && d[(size_t)i * n + j]
                                < (B1(i, j) + B2(i, j)) / 2.0 + 6.0)
                ++n_arom;
        }
        if (n_arom >= (int)ring.size() - 1) {
            for (auto& e : ring_edges) arom_edges.insert(e);
            for (int a : ring) arom_atoms.insert(a);
        }
    }

    if (!arom_edges.empty()) {
        std::set<int> need;
        for (int a : arom_atoms) {
            int e = m.elem[a];
            if (e == EL_C) need.insert(a);
            else if (e == EL_N && deg[a] == 2) need.insert(a);
        }
        // matching over need-need aromatic edges
        std::vector<int> nodes(need.begin(), need.end());
        std::map<int, int> idx;
        for (size_t k = 0; k < nodes.size(); ++k) idx[nodes[k]] = (int)k;
        Blossom bl((int)nodes.size());
        for (auto& e : arom_edges)
            if (need.count(e.first) && need.count(e.second))
                bl.add_edge(idx[e.first], idx[e.second]);
        bl.solve();
        for (size_t k = 0; k < nodes.size(); ++k) {
            int mk = bl.match[(int)k];
            if (mk >= 0 && (int)k < mk) {
                int i = nodes[k], j = nodes[mk];
                auto key = std::make_pair(std::min(i, j), std::max(i, j));
                order[key] = 2;
                used[i] += 1; used[j] += 1;
            }
        }
    }

    // 3) greedy valence-checked upgrades (bonds.py:143-158)
    struct Cand { double diff; int inc; int i, j; };
    std::vector<Cand> cands;
    for (auto& e : edges) {
        if (arom_edges.count(e)) continue;
        int i = e.first, j = e.second;
        double dij = d[(size_t)i * n + j];
        if (B3(i, j) > 0 && dij < B3(i, j) + MARGIN3)
            cands.push_back({dij - B3(i, j), 2, i, j});
        else if (B2(i, j) > 0 && dij < B2(i, j) + MARGIN2)
            cands.push_back({dij - B2(i, j), 1, i, j});
    }
    std::stable_sort(cands.begin(), cands.end(),
                     [](const Cand& a, const Cand& b) {
                         if (a.diff != b.diff) return a.diff < b.diff;
                         if (a.inc != b.inc) return a.inc < b.inc;
                         if (a.i != b.i) return a.i < b.i;
                         return a.j < b.j;
                     });
    for (auto& c : cands) {
        if (used[c.i] + c.inc <= cap[c.i] && used[c.j] + c.inc <= cap[c.j]) {
            order[{c.i, c.j}] += c.inc;
            used[c.i] += c.inc;
            used[c.j] += c.inc;
        }
    }

    m.bonds.clear();
    for (auto& e : edges)
        m.bonds.push_back({e.first, e.second, order[e]});
    m.adj.assign((size_t)n * n, 0);
    m.nbr.assign(n, {});
    for (auto& b : m.bonds) {
        m.adj[(size_t)b[0] * n + b[1]] = (int8_t)b[2];
        m.adj[(size_t)b[1] * n + b[0]] = (int8_t)b[2];
        m.nbr[b[0]].push_back(b[1]);
        m.nbr[b[1]].push_back(b[0]);
    }
    compute_implicit_h(m);
    // sanitize (sanitize.py:33-42): allowed valence per atom
    for (int i = 0; i < n; ++i) {
        int e = m.elem[i];
        if (ALLOWED_MAX[e] < 0) return false;  // 'others' atom -> invalid
        int v = m.bos[i];
        if (!(v <= ALLOWED_MAX[e] || v <= EXTRA_VALENCE[e])) return false;
    }
    compute_aromatic(m);
    return true;
}

// ---------------------------------------------------------------------
// descriptors (chem/descriptors.py)
// ---------------------------------------------------------------------
bool in_ring_bond(const Mol& m, int i, int j) {
    for (auto& r : m.rings) {
        bool fi = false, fj = false;
        for (int a : r) { fi |= (a == i); fj |= (a == j); }
        if (fi && fj) return true;
    }
    return false;
}

// Wildman-Crippen contribution constants (descriptors.py:28-40)
const double C_C1 = 0.1441, C_C2 = 0.0, C_C3 = -0.2035, C_C4 = -0.2051,
             C_C5 = -0.2783, C_C6 = 0.1551, C_C7 = 0.00170,
             C_C8 = 0.08452, C_C10 = -0.0516, C_C11 = 0.1193,
             C_C12 = -0.0967, C_C15 = 0.2450, C_C16 = 0.1980,
             C_C17 = 0.0, C_C18 = 0.1581, C_C19 = 0.2955, C_C20 = 0.2713,
             C_C21 = 0.1360, C_C22 = 0.4619, C_C23 = 0.5437,
             C_C24 = 0.1893, C_C25 = -0.8186,
             C_H1 = 0.1230, C_H2 = -0.2677, C_H3 = 0.2142, C_H4 = 0.2980,
             C_N1 = -1.0190, C_N2 = -0.7096, C_N3 = -1.0270,
             C_N4 = -0.5188, C_N5 = 0.08387, C_N6 = 0.1836,
             C_N7 = -0.3187, C_N8 = -0.4458, C_N9 = 0.01508,
             C_N11 = -0.3239, C_N13 = -0.3396,
             C_O1 = 0.1552, C_O2 = -0.2893, C_O3 = -0.0684,
             C_O4 = -0.4195, C_O5 = 0.0335, C_O9 = -0.1526,
             C_O10 = 0.1129,
             C_F = 0.4202, C_CL = 0.6895, C_BR = 0.8456, C_I = 0.8857,
             C_P = 0.8612, C_S1 = 0.6482, C_S3 = 0.6237, C_ME = -0.3808;

bool is_het(int e) {
    return e == EL_N || e == EL_O || e == EL_P || e == EL_S || e == EL_F
        || e == EL_CL || e == EL_BR || e == EL_I;
}

double carbon_contrib(const Mol& m, int i) {
    const auto& nb = m.nbr[i];
    bool arom = m.arom_atom[i];
    if (arom) {
        // aromatic carbon by exocyclic substituent (descriptors.py:49-85)
        std::vector<int> sub;
        for (int j : nb)
            if (!m.arom_atom[j] || !in_ring_bond(m, i, j)) sub.push_back(j);
        if (m.ih[i] > 0 && sub.empty()) return C_C18;
        int ring_nb = 0;
        for (int j : nb) ring_nb += m.arom_atom[j] ? 1 : 0;
        if (ring_nb >= 3) return C_C19;
        for (int j : sub) {
            int e = m.elem[j];
            if (m.ord(i, j) == 2) return C_C25;
            if (e == EL_N) return C_C22;
            if (e == EL_O) return C_C23;
            if (e == EL_S) return C_C24;
            if (e == EL_F) return C_C18;
            if (e == EL_CL) return C_C15;
            if (e == EL_BR) return C_C16;
            if (e == EL_I) return C_C17;
            if (e == EL_C && m.arom_atom[j]) return C_C20;
            if (e == EL_C) return C_C21;
        }
        return C_C18;
    }
    bool t3 = false, t2 = false;
    for (int j : nb) { int o = m.ord(i, j); t3 |= (o == 3); t2 |= (o == 2); }
    if (t3) return C_C7;
    if (t2) {
        for (int j : nb)
            if (m.ord(i, j) == 2 && m.elem[j] != EL_C) return C_C5;
        return C_C6;
    }
    int n_h = m.ih[i];
    bool het_nb = false, ar_nb = false;
    for (int j : nb) {
        if (is_het(m.elem[j])) het_nb = true;
        if (m.arom_atom[j]) ar_nb = true;
    }
    if (het_nb) return n_h >= 2 ? C_C3 : C_C4;
    if (ar_nb) {
        if (n_h >= 3) return C_C8;
        if (n_h == 2) return C_C10;
        if (n_h == 1) return C_C11;
        return C_C12;
    }
    return n_h >= 2 ? C_C1 : C_C2;
}

double nitrogen_contrib(const Mol& m, int i) {
    const auto& nb = m.nbr[i];
    if (m.arom_atom[i]) return C_N11;
    for (int j : nb) if (m.ord(i, j) == 3) return C_N9;
    int n_h = m.ih[i];
    bool arom_nb = false;
    for (int j : nb) arom_nb |= (bool)m.arom_atom[j];
    int n_o = 0;
    bool dbl_o = false;
    for (int j : nb)
        if (m.elem[j] == EL_O) { ++n_o; dbl_o |= (m.ord(i, j) == 2); }
    if (n_o >= 2 && dbl_o) return C_N13;
    bool any2 = false;
    for (int j : nb) any2 |= (m.ord(i, j) == 2);
    if (any2) return n_h > 0 ? C_N5 : C_N6;
    if (n_h >= 2) return arom_nb ? C_N3 : C_N1;
    if (n_h == 1) return arom_nb ? C_N4 : C_N2;
    return arom_nb ? C_N8 : C_N7;
}

double oxygen_contrib(const Mol& m, int i) {
    const auto& nb = m.nbr[i];
    if (m.arom_atom[i]) return C_O1;
    bool any2 = false;
    for (int j : nb) any2 |= (m.ord(i, j) == 2);
    if (any2) {
        int j = nb[0];  // first-neighbour quirk kept (descriptors.py:139)
        if (m.elem[j] == EL_N) return C_O5;
        for (int k : m.nbr[j]) if (m.arom_atom[k]) return C_O10;
        return C_O9;
    }
    if (m.ih[i] > 0) return C_O2;
    for (int j : nb) if (m.arom_atom[j]) return C_O4;
    return C_O3;
}

double crippen_logp(const Mol& m) {
    double total = 0.0;
    for (int i = 0; i < m.n; ++i) {
        int e = m.elem[i];
        int n_h = m.ih[i];
        if (e == EL_C) {
            total += carbon_contrib(m, i);
            total += n_h * C_H1;
        } else if (e == EL_N) {
            total += nitrogen_contrib(m, i);
            total += n_h * C_H3;
        } else if (e == EL_O) {
            total += oxygen_contrib(m, i);
            if (n_h) {
                bool carbonyl_nb = false;
                for (int j : m.nbr[i]) {
                    if (m.elem[j] != EL_C) continue;
                    for (int k : m.nbr[j])
                        if (m.ord(j, k) == 2 && m.elem[k] == EL_O)
                            carbonyl_nb = true;
                }
                total += n_h * (carbonyl_nb ? C_H4 : C_H2);
            }
        } else if (e == EL_S) {
            total += m.arom_atom[i] ? C_S3 : C_S1;
            total += n_h * C_H2;
        } else if (e == EL_F) total += C_F;
        else if (e == EL_CL) total += C_CL;
        else if (e == EL_BR) total += C_BR;
        else if (e == EL_I) total += C_I;
        else if (e == EL_P) total += C_P;
        else total += C_ME;
    }
    return total;
}

int num_hbd(const Mol& m) {
    int n = 0;
    for (int i = 0; i < m.n; ++i)
        if ((m.elem[i] == EL_N || m.elem[i] == EL_O) && m.ih[i] > 0) ++n;
    return n;
}

int num_hba(const Mol& m) {
    int n = 0;
    for (int i = 0; i < m.n; ++i)
        if (m.elem[i] == EL_N || m.elem[i] == EL_O) ++n;
    return n;
}

int num_rotb(const Mol& m) {
    std::vector<char> triple(m.n, 0);
    for (auto& b : m.bonds)
        if (b[2] == 3) { triple[b[0]] = 1; triple[b[1]] = 1; }
    int n = 0;
    for (auto& b : m.bonds) {
        if (b[2] != 1) continue;
        if ((int)m.nbr[b[0]].size() < 2 || (int)m.nbr[b[1]].size() < 2)
            continue;
        if (triple[b[0]] || triple[b[1]]) continue;
        if (in_ring_bond(m, b[0], b[1])) continue;
        ++n;
    }
    return n;
}

double tpsa(const Mol& m) {
    double total = 0.0;
    for (int i = 0; i < m.n; ++i) {
        int e = m.elem[i];
        if (e != EL_N && e != EL_O) continue;
        const auto& nb = m.nbr[i];
        bool any2 = false, any3 = false;
        for (int j : nb) {
            int o = m.ord(i, j);
            any2 |= (o == 2);
            any3 |= (o == 3);
        }
        int n_h = m.ih[i];
        bool arom = m.arom_atom[i];
        if (e == EL_N) {
            if (arom) {
                if (n_h > 0) total += 15.79;
                else if ((int)nb.size() >= 3) total += 4.93;
                else total += 12.89;
            } else if (any3) total += 23.79;
            else if (any2) {
                int n_o = 0;
                for (int j : nb) n_o += (m.elem[j] == EL_O);
                if (n_o >= 2) total += 11.68;
                else total += n_h > 0 ? 23.85 : 12.36;
            } else {
                if (n_h == 0) total += 3.24;
                else if (n_h == 1) total += 12.03;
                else total += 26.02;
            }
        } else {  // O
            if (arom) total += 13.14;
            else if (any2) total += 17.07;
            else if (n_h > 0) total += 20.23;
            else total += 9.23;
        }
    }
    return total;
}

double mol_weight(const Mol& m) {
    double w = 0.0;
    for (int i = 0; i < m.n; ++i) w += MASS[m.elem[i]];
    for (int i = 0; i < m.n; ++i) w += MASS_H * m.ih[i];
    return w;
}

// ----- the 32 structural-alert classes (descriptors.py:271-668) --------
namespace alerts {

bool hetero3ring(const Mol& m) {
    for (auto& r : m.rings)
        if (r.size() == 3)
            for (int a : r)
                if (m.elem[a] == EL_N || m.elem[a] == EL_O
                    || m.elem[a] == EL_S) return true;
    return false;
}

bool is_halogen(int e) {
    return e == EL_F || e == EL_CL || e == EL_BR || e == EL_I;
}

bool acyl_halide(const Mol& m) {
    for (int i = 0; i < m.n; ++i) {
        int e = m.elem[i];
        if (e != EL_C && e != EL_S) continue;
        bool d = false, h = false;
        for (int j : m.nbr[i]) {
            if (m.ord(i, j) == 2 && (m.elem[j] == EL_O || m.elem[j] == EL_S))
                d = true;
            if (is_halogen(m.elem[j])) h = true;
        }
        if (d && h) return true;
    }
    return false;
}

bool alkyl_halide(const Mol& m) {
    for (int i = 0; i < m.n; ++i) {
        if (m.elem[i] != EL_C || m.arom_atom[i]) continue;
        bool multi = false;
        for (int j : m.nbr[i]) multi |= (m.ord(i, j) >= 2);
        if (multi) continue;
        for (int j : m.nbr[i]) {
            int e = m.elem[j];
            if (e == EL_CL || e == EL_BR || e == EL_I) return true;
        }
    }
    return false;
}

bool aldehyde(const Mol& m) {
    for (int i = 0; i < m.n; ++i) {
        if (m.elem[i] != EL_C || m.ih[i] < 1) continue;
        for (int j : m.nbr[i])
            if (m.ord(i, j) == 2 && m.elem[j] == EL_O) return true;
    }
    return false;
}

bool peroxide(const Mol& m) {
    for (auto& b : m.bonds)
        if (m.elem[b[0]] == EL_O && m.elem[b[1]] == EL_O) return true;
    return false;
}

bool disulfide(const Mol& m) {
    for (auto& b : m.bonds)
        if (m.elem[b[0]] == EL_S && m.elem[b[1]] == EL_S) return true;
    return false;
}

bool acyclic_imine(const Mol& m) {
    for (auto& b : m.bonds) {
        if (b[2] != 2 || m.ring_member[b[0]] || m.ring_member[b[1]])
            continue;
        int a = m.elem[b[0]], c = m.elem[b[1]];
        if ((a == EL_C && c == EL_N) || (a == EL_N && c == EL_C))
            return true;
    }
    return false;
}

bool acyclic_azo(const Mol& m) {
    for (auto& b : m.bonds)
        if (b[2] == 2 && !m.ring_member[b[0]] && !m.ring_member[b[1]]
            && m.elem[b[0]] == EL_N && m.elem[b[1]] == EL_N) return true;
    return false;
}

bool hydrazine(const Mol& m) {
    for (auto& b : m.bonds)
        if (b[2] == 1 && m.elem[b[0]] == EL_N && m.elem[b[1]] == EL_N
            && (m.ih[b[0]] >= 2 || m.ih[b[1]] >= 2)) return true;
    return false;
}

bool is_carbonyl(const Mol& m, int i) {
    if (m.elem[i] != EL_C) return false;
    for (int j : m.nbr[i])
        if (m.ord(i, j) == 2 && m.elem[j] == EL_O) return true;
    return false;
}

bool dicarbonyl(const Mol& m) {
    for (auto& b : m.bonds)
        if (b[2] == 1 && m.elem[b[0]] == EL_C && m.elem[b[1]] == EL_C
            && is_carbonyl(m, b[0]) && is_carbonyl(m, b[1])) return true;
    return false;
}

bool thiocarbonyl(const Mol& m) {
    for (auto& b : m.bonds) {
        if (b[2] != 2) continue;
        int a = m.elem[b[0]], c = m.elem[b[1]];
        if ((a == EL_C && c == EL_S) || (a == EL_S && c == EL_C))
            return true;
    }
    return false;
}

bool thiol(const Mol& m) {
    for (int i = 0; i < m.n; ++i)
        if (m.elem[i] == EL_S && m.ih[i] >= 1) return true;
    return false;
}

bool nitro(const Mol& m) {
    for (int i = 0; i < m.n; ++i) {
        if (m.elem[i] != EL_N) continue;
        int n_o = 0;
        bool dbl = false;
        for (int j : m.nbr[i])
            if (m.elem[j] == EL_O) { ++n_o; dbl |= (m.ord(i, j) == 2); }
        if (n_o >= 2 && dbl) return true;
    }
    return false;
}

bool n_oxide_family(const Mol& m) {
    for (int i = 0; i < m.n; ++i) {
        if (m.elem[i] != EL_N) continue;
        std::vector<int> o_nb;
        for (int j : m.nbr[i]) if (m.elem[j] == EL_O) o_nb.push_back(j);
        if (o_nb.empty()) continue;
        int dbl = 0;
        for (int j : o_nb) dbl += (m.ord(i, j) == 2);
        if ((int)o_nb.size() >= 2 && dbl) continue;  // nitro
        for (int j : o_nb)
            if ((int)m.nbr[j].size() == 1) return true;
    }
    return false;
}

bool aniline(const Mol& m) {
    for (int i = 0; i < m.n; ++i) {
        if (m.elem[i] != EL_N || m.ih[i] < 2) continue;
        for (int j : m.nbr[i]) if (m.arom_atom[j]) return true;
    }
    return false;
}

bool heteroatom_list(const Mol& m) {
    // organic set = {C,N,O,S,P,F,Cl,Br,I,H,B,Si}: of our codes only
    // EL_OTHER falls outside it
    for (int i = 0; i < m.n; ++i)
        if (m.elem[i] == EL_OTHER) return true;
    return false;
}

bool iodine(const Mol& m) {
    for (int i = 0; i < m.n; ++i) if (m.elem[i] == EL_I) return true;
    return false;
}

bool alkyne(const Mol& m) {
    for (auto& b : m.bonds)
        if (b[2] == 3 && m.elem[b[0]] == EL_C && m.elem[b[1]] == EL_C)
            return true;
    return false;
}

bool sulfonate(const Mol& m) {
    for (int i = 0; i < m.n; ++i) {
        if (m.elem[i] != EL_S) continue;
        int dbl_o = 0;
        bool big_sng = false;
        for (int j : m.nbr[i]) {
            if (m.elem[j] != EL_O) continue;
            if (m.ord(i, j) == 2) ++dbl_o;
            else if ((int)m.nbr[j].size() >= 2) big_sng = true;
        }
        if (dbl_o >= 2 && big_sng) return true;
    }
    return false;
}

bool michael_acceptor(const Mol& m) {
    for (auto& b : m.bonds) {
        if (b[2] != 2 || m.elem[b[0]] != EL_C || m.elem[b[1]] != EL_C)
            continue;
        if (m.ring_member[b[0]] && m.ring_member[b[1]]) continue;
        for (int end : {b[0], b[1]})
            for (int k : m.nbr[end]) {
                if (k == b[0] || k == b[1] || m.elem[k] != EL_C) continue;
                for (int l : m.nbr[k])
                    if (m.ord(k, l) == 2 && m.elem[l] == EL_O) return true;
            }
    }
    return false;
}

bool long_chain(const Mol& m) {
    auto mid = [&](int a) {
        return !m.ring_member[a] && (int)m.nbr[a].size() == 2;
    };
    for (auto& b : m.bonds) {
        if (!(mid(b[0]) && mid(b[1]))) continue;
        for (int k : m.nbr[b[0]]) {
            if (k == b[1] || !mid(k)) continue;
            for (int l : m.nbr[b[1]])
                if (l != b[0] && mid(l)) return true;
        }
    }
    return false;
}

bool quinone(const Mol& m) {
    for (auto& r : m.rings) {
        if (r.size() != 6) continue;
        int exo = 0;
        bool all_c = true;
        for (int a : r) {
            if (m.elem[a] != EL_C) { all_c = false; break; }
            bool has = false;
            for (int j : m.nbr[a]) {
                if (m.ord(a, j) != 2) continue;
                if (m.elem[j] != EL_O && m.elem[j] != EL_N) continue;
                bool in_r = false;
                for (int x : r) in_r |= (x == j);
                if (!in_r) has = true;
            }
            exo += has;
        }
        if (all_c && exo >= 2) return true;
    }
    return false;
}

bool polyaromatic(const Mol& m) {
    size_t k = m.arom_rings.size();
    if (k < 3) return false;
    std::vector<std::set<int>> rs;
    for (auto& r : m.arom_rings) rs.emplace_back(r.begin(), r.end());
    for (size_t x = 0; x < k; ++x) {
        int fused = 0;
        for (size_t y = 0; y < k; ++y) {
            if (y == x) continue;
            bool inter = false;
            for (int a : rs[x]) if (rs[y].count(a)) { inter = true; break; }
            fused += inter;
        }
        if (fused >= 2) return true;
    }
    return false;
}

bool big_carbocycle(const Mol& m) {
    for (auto& r : m.rings) {
        if (r.size() < 7) continue;
        bool all_c = true;
        for (int a : r) all_c &= (m.elem[a] == EL_C);
        if (all_c) return true;
    }
    return false;
}

bool trihalo_phenyl(const Mol& m) {
    for (auto& r : m.arom_rings) {
        std::set<int> rs(r.begin(), r.end());
        int n_h = 0;
        for (int a : r)
            for (int j : m.nbr[a])
                if (!rs.count(j) && is_halogen(m.elem[j])) ++n_h;
        if (n_h >= 3) return true;
    }
    return false;
}

bool catechol(const Mol& m) {
    for (auto& r : m.arom_rings) {
        std::set<int> rs(r.begin(), r.end());
        int subs = 0;
        for (int a : r)
            for (int j : m.nbr[a]) {
                if (rs.count(j)) continue;
                if ((m.elem[j] == EL_O || m.elem[j] == EL_N)
                    && (int)m.nbr[j].size() == 1 && m.ih[j] >= 1) ++subs;
            }
        if (subs >= 2) return true;
    }
    return false;
}

bool cumulene(const Mol& m) {
    for (int i = 0; i < m.n; ++i) {
        if (m.elem[i] != EL_C) continue;
        int dbl_c = 0;
        for (int j : m.nbr[i])
            if (m.ord(i, j) == 2 && m.elem[j] == EL_C) ++dbl_c;
        if (dbl_c >= 2) return true;
    }
    return false;
}

bool aliphatic_alkene(const Mol& m) {
    auto sp3_c = [&](int j) {
        if (m.elem[j] != EL_C || m.arom_atom[j]) return false;
        for (int k : m.nbr[j]) if (m.ord(j, k) > 1) return false;
        return true;
    };
    auto qual = [&](int a, int other) {
        for (int j : m.nbr[a])
            if (j != other && !sp3_c(j)) return false;
        return true;
    };
    for (auto& b : m.bonds)
        if (b[2] == 2 && m.elem[b[0]] == EL_C && m.elem[b[1]] == EL_C
            && qual(b[0], b[1]) && qual(b[1], b[0])) return true;
    return false;
}

bool aryl_ester(const Mol& m) {
    for (int i = 0; i < m.n; ++i) {
        if (m.elem[i] != EL_O || (int)m.nbr[i].size() != 2) continue;
        int a = m.nbr[i][0], b = m.nbr[i][1];
        for (auto& p : {std::make_pair(a, b), std::make_pair(b, a)}) {
            int ar = p.first, c = p.second;
            if (!m.arom_atom[ar] || m.elem[c] != EL_C) continue;
            for (int k : m.nbr[c])
                if (m.ord(c, k) == 2 && m.elem[k] == EL_O) return true;
        }
    }
    return false;
}

bool azide(const Mol& m) {
    for (int i = 0; i < m.n; ++i) {
        if (m.elem[i] != EL_N) continue;
        int n_nb = 0;
        for (int j : m.nbr[i])
            if (m.elem[j] == EL_N && m.ord(i, j) >= 2) ++n_nb;
        if (n_nb >= 2) return true;
    }
    return false;
}

bool halo_heteroaromatic(const Mol& m) {
    for (auto& r : m.arom_rings) {
        std::set<int> rs(r.begin(), r.end());
        for (int a : r) {
            if (m.elem[a] != EL_N) continue;
            for (int c : m.nbr[a]) {
                if (!rs.count(c)) continue;
                for (int x : m.nbr[c])
                    if (!rs.count(x) && is_halogen(m.elem[x])) return true;
            }
        }
    }
    return false;
}

bool big_azacycle(const Mol& m) {
    for (auto& r : m.rings) {
        if (r.size() < 7) continue;
        int n_n = 0, n_c = 0;
        for (int a : r) {
            n_n += (m.elem[a] == EL_N);
            n_c += (m.elem[a] == EL_C);
        }
        if (n_n == 1 && n_c == (int)r.size() - 1) return true;
    }
    return false;
}

}  // namespace alerts

int structural_alerts(const Mol& m) {
    using namespace alerts;
    int n = 0;
    n += hetero3ring(m); n += acyl_halide(m); n += alkyl_halide(m);
    n += aldehyde(m); n += peroxide(m); n += disulfide(m);
    n += acyclic_imine(m); n += acyclic_azo(m); n += hydrazine(m);
    n += dicarbonyl(m); n += thiocarbonyl(m); n += thiol(m); n += nitro(m);
    n += n_oxide_family(m); n += aniline(m); n += heteroatom_list(m);
    n += iodine(m); n += alkyne(m); n += sulfonate(m);
    n += michael_acceptor(m); n += long_chain(m); n += quinone(m);
    n += polyaromatic(m); n += big_carbocycle(m); n += trihalo_phenyl(m);
    n += catechol(m); n += cumulene(m); n += aliphatic_alkene(m);
    n += aryl_ester(m); n += azide(m); n += halo_heteroaromatic(m);
    n += big_azacycle(m);
    return n;
}

// ---------------------------------------------------------------------
// QED (properties.py:31-92)
// ---------------------------------------------------------------------
struct ADS { double a, b, c, d, e, f, dmax; };
const ADS ADS_MW{2.817065973, 392.5754953, 290.7489764, 2.419764353,
                 49.22325677, 65.37051707, 104.9805561};
const ADS ADS_ALOGP{3.172690585, 137.8624751, 2.534937431, 4.581497897,
                    0.822739154, 0.576295591, 131.3186604};
const ADS ADS_HBA{2.948620388, 160.4605972, 3.615294657, 4.435986202,
                  0.290141953, 1.300669958, 148.7763046};
const ADS ADS_HBD{1.618662227, 1010.051101, 0.985094388, 0.000000001,
                  0.713820843, 0.920922555, 258.1632616};
const ADS ADS_PSA{1.876861559, 125.2232657, 62.90773554, 87.83366614,
                  12.01999824, 28.51324732, 104.5686167};
const ADS ADS_ROTB{0.010000000, 272.4121427, 2.558379970, 1.565547684,
                   1.271567166, 2.758063707, 105.4420403};
const ADS ADS_AROM{3.217788970, 957.7374108, 2.274627939, 0.000000001,
                   1.317690384, 0.375760881, 312.3372610};
const ADS ADS_ALERTS{0.010000000, 1199.094025, -0.09002883, 0.000000001,
                     0.185904477, 0.875193782, 417.7253140};

double ads(double x, const ADS& p) {
    return (p.a + p.b / (1 + std::exp(-(x - p.c + p.d / 2) / p.e))
            * (1 - 1 / (1 + std::exp(-(x - p.c - p.d / 2) / p.f))))
           / p.dmax;
}

struct QedProps {
    double mw, alogp, psa;
    int hba, hbd, rotb, arom, alerts;
};

QedProps qed_properties(const Mol& m) {
    return {mol_weight(m), crippen_logp(m), tpsa(m), num_hba(m),
            num_hbd(m), num_rotb(m), (int)m.arom_rings.size(),
            structural_alerts(m)};
}

double qed_from_props(const QedProps& p) {
    // iteration order matches the Python dict (MW..ALERTS)
    const double W_MW = 0.66, W_ALOGP = 0.46, W_HBA = 0.05, W_HBD = 0.61,
                 W_PSA = 0.06, W_ROTB = 0.65, W_AROM = 0.48,
                 W_ALERTS = 0.95;
    double num = 0.0, den = 0.0;
    auto add = [&](double w, double x, const ADS& a) {
        double d = std::max(ads(x, a), 1e-10);
        num += w * std::log(d);
        den += w;
    };
    add(W_MW, p.mw, ADS_MW);
    add(W_ALOGP, p.alogp, ADS_ALOGP);
    add(W_HBA, p.hba, ADS_HBA);
    add(W_HBD, p.hbd, ADS_HBD);
    add(W_PSA, p.psa, ADS_PSA);
    add(W_ROTB, p.rotb, ADS_ROTB);
    add(W_AROM, p.arom, ADS_AROM);
    add(W_ALERTS, p.alerts, ADS_ALERTS);
    return std::exp(num / den);
}

// ---------------------------------------------------------------------
// Morgan count fingerprint (chem/morgan.py) — RDKit-compatible bit IDs
// ---------------------------------------------------------------------
const uint32_t GOLDEN = 0x9E3779B9u;

uint32_t hash_combine(uint32_t seed, uint32_t v) {
    return seed ^ (v + GOLDEN + (seed << 6) + (seed >> 2));
}

// counts in insertion order (bit, count) to mirror the Python dict
struct Counts {
    std::vector<std::pair<uint32_t, double>> items;
    std::map<uint32_t, size_t> pos;
    void add(uint32_t bit) {
        auto it = pos.find(bit);
        if (it == pos.end()) {
            pos[bit] = items.size();
            items.push_back({bit, 1.0});
        } else {
            items[it->second].second += 1.0;
        }
    }
};

bool morgan_counts(const Mol& m, int radius, Counts& counts) {
    int n = m.n;
    int nb_bonds = (int)m.bonds.size();
    if (nb_bonds > 64) return false;  // bitset width; Python handles any

    // aromatic bond set (morgan.py:60-72)
    std::vector<int> bond_type(nb_bonds);
    for (int k = 0; k < nb_bonds; ++k) {
        int i = m.bonds[k][0], j = m.bonds[k][1];
        bool arom = false;
        for (auto& r : m.arom_rings) {
            bool fi = false, fj = false;
            for (int a : r) { fi |= (a == i); fj |= (a == j); }
            if (fi && fj) { arom = true; break; }
        }
        bond_type[k] = arom ? 12 : m.bonds[k][2];
    }
    // connectivity invariants (morgan.py:75-92)
    std::vector<uint32_t> inv(n);
    for (int i = 0; i < n; ++i) {
        int h = m.ih[i];
        uint32_t seed = 0;
        seed = hash_combine(seed, (uint32_t)ATOMIC_NUM[m.elem[i]]);
        seed = hash_combine(seed, (uint32_t)((int)m.nbr[i].size() + h));
        seed = hash_combine(seed, (uint32_t)h);
        seed = hash_combine(seed, 0u);  // formal charge (neutral)
        seed = hash_combine(seed, 0u);  // deltaMass
        if (m.ring_member[i]) seed = hash_combine(seed, 1u);
        inv[i] = seed;
    }
    for (int i = 0; i < n; ++i) counts.add(inv[i]);
    if (radius == 0 || n == 0) return true;

    std::vector<std::vector<int>> bond_index(n);  // parallel to nbr
    {
        std::vector<std::map<int, int>> bi(n);
        for (int k = 0; k < nb_bonds; ++k) {
            bi[m.bonds[k][0]][m.bonds[k][1]] = k;
            bi[m.bonds[k][1]][m.bonds[k][0]] = k;
        }
        for (int i = 0; i < n; ++i)
            for (int j : m.nbr[i]) bond_index[i].push_back(bi[i][j]);
    }

    std::vector<uint64_t> neighborhoods;
    std::vector<uint64_t> atom_envs(n, 0);
    std::vector<char> dead(n, 0);

    for (int layer = 0; layer < radius; ++layer) {
        std::vector<uint32_t> round_inv(n, 0);
        std::vector<uint64_t> round_envs = atom_envs;
        struct Entry { uint64_t env; uint32_t invar; int atom; };
        std::vector<Entry> this_round;
        for (int a = 0; a < n; ++a) {
            if (dead[a]) continue;
            if (m.nbr[a].empty()) { dead[a] = 1; continue; }
            uint64_t env = round_envs[a];
            std::vector<std::pair<int, uint32_t>> pairs;
            for (size_t t = 0; t < m.nbr[a].size(); ++t) {
                int j = m.nbr[a][t];
                int k = bond_index[a][t];
                env |= (1ull << k);
                env |= atom_envs[j];
                pairs.push_back({bond_type[k], inv[j]});
            }
            round_envs[a] = env;
            std::sort(pairs.begin(), pairs.end());
            uint32_t invar = (uint32_t)layer;
            invar = hash_combine(invar, inv[a]);
            for (auto& p : pairs) {
                uint32_t ph = hash_combine(hash_combine(0u,
                                                        (uint32_t)p.first),
                                           p.second);
                invar = hash_combine(invar, ph);
            }
            round_inv[a] = invar;
            this_round.push_back({env, invar, a});
            for (uint64_t nh : neighborhoods)
                if (nh == env) { dead[a] = 1; break; }
        }
        std::sort(this_round.begin(), this_round.end(),
                  [](const Entry& x, const Entry& y) {
                      if (x.env != y.env) return x.env < y.env;
                      if (x.invar != y.invar) return x.invar < y.invar;
                      return x.atom < y.atom;
                  });
        for (auto& e : this_round) {
            bool seen = false;
            for (uint64_t nh : neighborhoods)
                if (nh == e.env) { seen = true; break; }
            if (!seen) {
                counts.add(e.invar);
                neighborhoods.push_back(e.env);
            } else {
                dead[e.atom] = 1;
            }
        }
        inv = round_inv;
        atom_envs = round_envs;
    }
    return true;
}

// ---------------------------------------------------------------------
// SA score (properties.py:138-313)
// ---------------------------------------------------------------------
double fragment_score(const Mol& m, const uint32_t* fp_bits,
                      const float* fp_scores, int64_t n_fp,
                      int* n_distinct, bool* ok) {
    Counts counts;
    if (!morgan_counts(m, 2, counts)) { *ok = false; return 0.0; }
    *ok = true;
    *n_distinct = (int)counts.items.size();
    double num = 0.0, den = 0.0;
    for (auto& it : counts.items) {
        const uint32_t* lo = std::lower_bound(fp_bits, fp_bits + n_fp,
                                              it.first);
        double v = (lo != fp_bits + n_fp && *lo == it.first)
                       ? (double)fp_scores[lo - fp_bits] : -4.0;
        num += v * it.second;
        den += it.second;
    }
    return num / den;
}

// WL stereo-branch machinery (properties.py:154-219)
struct Branch {
    int order;
    std::vector<int> comp;  // DFS order, root first
};

Branch collect_branch(const Mol& m, int root, int banned) {
    Branch br;
    br.order = m.ord(banned, root);
    std::vector<char> seen(m.n, 0);
    seen[banned] = 1;
    seen[root] = 1;
    std::vector<int> stack{root};
    br.comp.push_back(root);
    while (!stack.empty()) {
        int u = stack.back();
        stack.pop_back();
        for (int v : m.nbr[u])
            if (!seen[v]) {
                seen[v] = 1;
                br.comp.push_back(v);
                stack.push_back(v);
            }
    }
    return br;
}

// cheap invariant: (order, size, sorted multiset of (elem, ih))
typedef std::pair<std::pair<int, int>,
                  std::vector<std::pair<int, int>>> CheapKey;

CheapKey cheap_key(const Mol& m, const Branch& b) {
    std::vector<std::pair<int, int>> sig;
    for (int v : b.comp) sig.push_back({m.elem[v], m.ih[v]});
    std::sort(sig.begin(), sig.end());
    return {{b.order, (int)b.comp.size()}, sig};
}

// joint exact WL over a group of same-size branches; returns per-branch
// canonical key (root label, sorted labels)
std::vector<std::pair<int, std::vector<int>>> joint_wl(
        const Mol& m, const std::vector<const Branch*>& group, int center) {
    int size = (int)group[0]->comp.size();
    int iters = std::min(size, 12);
    int total = 0;
    for (auto* b : group) total += (int)b->comp.size();
    // local indexing
    std::vector<int> atom_of(total), branch_of(total);
    std::vector<std::vector<int>> local_of(group.size(),
                                           std::vector<int>(m.n, -1));
    int t = 0;
    for (size_t g = 0; g < group.size(); ++g)
        for (int v : group[g]->comp) {
            atom_of[t] = v;
            branch_of[t] = (int)g;
            local_of[g][v] = t;
            ++t;
        }
    // initial labels: canonical index of (elem, ih)
    std::vector<std::pair<int, int>> init(total);
    for (int u = 0; u < total; ++u)
        init[u] = {m.elem[atom_of[u]], m.ih[atom_of[u]]};
    std::vector<std::pair<int, int>> uniq(init);
    std::sort(uniq.begin(), uniq.end());
    uniq.erase(std::unique(uniq.begin(), uniq.end()), uniq.end());
    std::vector<int> label(total);
    for (int u = 0; u < total; ++u)
        label[u] = (int)(std::lower_bound(uniq.begin(), uniq.end(),
                                          init[u]) - uniq.begin());
    // neighbour lists within branches (exclude the banned center)
    std::vector<std::vector<std::pair<int, int>>> lnbr(total);  // (ord,local)
    for (int u = 0; u < total; ++u) {
        int g = branch_of[u], v = atom_of[u];
        for (int w : m.nbr[v]) {
            if (w == center) continue;
            int lw = local_of[g][w];
            if (lw >= 0) lnbr[u].push_back({m.ord(v, w), lw});
        }
    }
    for (int it = 0; it < iters; ++it) {
        typedef std::pair<int, std::vector<std::pair<int, int>>> Sig;
        std::vector<Sig> sigs(total);
        for (int u = 0; u < total; ++u) {
            std::vector<std::pair<int, int>> ns;
            for (auto& p : lnbr[u]) ns.push_back({p.first, label[p.second]});
            std::sort(ns.begin(), ns.end());
            sigs[u] = {label[u], ns};
        }
        std::vector<Sig> su(sigs);
        std::sort(su.begin(), su.end());
        su.erase(std::unique(su.begin(), su.end()), su.end());
        for (int u = 0; u < total; ++u)
            label[u] = (int)(std::lower_bound(su.begin(), su.end(),
                                              sigs[u]) - su.begin());
    }
    std::vector<std::pair<int, std::vector<int>>> out;
    for (size_t g = 0; g < group.size(); ++g) {
        std::vector<int> all;
        for (int v : group[g]->comp) all.push_back(label[local_of[g][v]]);
        int root_label = label[local_of[g][group[g]->comp[0]]];
        std::sort(all.begin(), all.end());
        out.push_back({root_label, all});
    }
    return out;
}

bool distinct_branches(const Mol& m, int center,
                       const std::vector<int>& roots, bool extra_h) {
    std::vector<Branch> branches;
    for (int r : roots) branches.push_back(collect_branch(m, r, center));
    std::vector<CheapKey> keys;
    for (auto& b : branches) keys.push_back(cheap_key(m, b));
    int n_keys = (int)keys.size() + (extra_h ? 1 : 0);
    {
        std::vector<CheapKey> s(keys);
        std::sort(s.begin(), s.end());
        bool dup = false;
        for (size_t i = 1; i < s.size(); ++i)
            if (s[i] == s[i - 1]) dup = true;
        // the implicit-H pseudo branch can never equal a real branch
        if (!dup) return true;
        (void)n_keys;
    }
    // group colliding cheap keys, compare via joint WL
    std::map<CheapKey, std::vector<int>> groups;
    for (size_t i = 0; i < keys.size(); ++i) groups[keys[i]].push_back((int)i);
    for (auto& kv : groups) {
        if (kv.second.size() < 2) continue;
        std::vector<const Branch*> grp;
        for (int i : kv.second) grp.push_back(&branches[i]);
        auto full = joint_wl(m, grp, center);
        std::sort(full.begin(), full.end());
        for (size_t i = 1; i < full.size(); ++i)
            if (full[i] == full[i - 1]) return false;
    }
    return true;
}

int num_stereocenters(const Mol& m) {
    int n_centers = 0;
    for (int a = 0; a < m.n; ++a) {
        int e = m.elem[a];
        int deg = (int)m.nbr[a].size();
        int h = m.ih[a];
        if (e == EL_P && deg == 3 && h == 0) {
            if (distinct_branches(m, a, m.nbr[a], false)) ++n_centers;
        } else if (deg + h == 4 && h <= 1 && deg >= 3) {
            // allowed centers: C, Si, N, P, S — of our codes C/N/P/S
            if (!(e == EL_C || e == EL_N || e == EL_P || e == EL_S))
                continue;
            if (e == EL_N) continue;  // neutral N never counts
            if (distinct_branches(m, a, m.nbr[a], h == 1)) ++n_centers;
        }
    }
    return n_centers;
}

void spiro_and_bridge(const Mol& m, int* n_spiro, int* n_bridge) {
    size_t k = m.rings.size();
    std::vector<std::set<int>> rs;
    std::vector<std::set<std::pair<int, int>>> rb;
    for (auto& r : m.rings) {
        rs.emplace_back(r.begin(), r.end());
        std::set<std::pair<int, int>> eb;
        for (auto& b : m.bonds)
            if (rs.back().count(b[0]) && rs.back().count(b[1]))
                eb.insert({std::min(b[0], b[1]), std::max(b[0], b[1])});
        rb.push_back(eb);
    }
    std::set<int> spiro, bridge;
    for (size_t x = 0; x < k; ++x)
        for (size_t y = x + 1; y < k; ++y) {
            std::vector<int> inter;
            for (int a : rs[x]) if (rs[y].count(a)) inter.push_back(a);
            if (inter.size() == 1) spiro.insert(inter[0]);
            std::vector<std::pair<int, int>> shared;
            for (auto& e : rb[x]) if (rb[y].count(e)) shared.push_back(e);
            if (shared.size() >= 2)
                for (int a : inter) {
                    int cnt = 0;
                    for (auto& e : shared)
                        cnt += (e.first == a || e.second == a);
                    if (cnt == 1) bridge.insert(a);
                }
        }
    *n_spiro = (int)spiro.size();
    *n_bridge = (int)bridge.size();
}

double sa_score_raw(const Mol& m, const uint32_t* fp_bits,
                    const float* fp_scores, int64_t n_fp, bool* ok) {
    int n = m.n;
    if (n == 0) { *ok = true; return 10.0; }
    int n_distinct = 0;
    double score1 = fragment_score(m, fp_bits, fp_scores, n_fp,
                                   &n_distinct, ok);
    if (!*ok) return 0.0;

    double size_penalty = std::pow((double)n, 1.005) - n;
    double stereo_penalty = std::log10((double)num_stereocenters(m) + 1);
    int n_spiro, n_bridge;
    spiro_and_bridge(m, &n_spiro, &n_bridge);
    double spiro_penalty = std::log10((double)n_spiro + 1);
    double bridge_penalty = std::log10((double)n_bridge + 1);
    double macro_penalty = 0.0;
    for (auto& r : m.rings)
        if (r.size() > 8) { macro_penalty = std::log10(2.0); break; }
    double score2 = -size_penalty - stereo_penalty - spiro_penalty
                    - bridge_penalty - macro_penalty;
    double score3 = 0.0;
    if (n > n_distinct)
        score3 = std::log((double)n / n_distinct) * 0.5;
    double sa = score1 + score2 + score3;
    const double smin = -4.0, smax = 2.5;
    sa = 11.0 - (sa - smin + 1) / (smax - smin) * 9.0;
    if (sa > 8.0) sa = 8.0 + std::log(sa + 1.0 - 9.0);
    return std::min(std::max(sa, 1.0), 10.0);
}

// round-half-even to 2 decimals, matching Python round(x, 2)
double round2(double x) {
    double scaled = x * 100.0;
    double r = std::nearbyint(scaled);  // default FE_TONEAREST = half-even
    return r / 100.0;
}

int lipinski_count(const Mol& m, double logp_val) {
    int rules = 0;
    rules += (mol_weight(m) < 500.0);
    rules += (num_hbd(m) <= 5);
    rules += (num_hba(m) <= 10);
    rules += (logp_val >= -2.0);  // compat_walrus quirk
    rules += (num_rotb(m) <= 10);
    return rules;
}

double sigmoid(double z) { return 1.0 / (1.0 + std::exp(-z)); }

}  // namespace

extern "C" {

// Score a padded batch of generated point clouds.  Returns the number of
// molecules scored natively; molecules the native path cannot handle
// (>64 bonds) get out_native[b] = 0 and must be scored by the Python
// fallback.
//   coords  [B*N*3] float32 Angstrom   types [B*N] int32   mask [B*N] u8
//   elem_codes [T] int32 (enum Elem)
//   b1,b2,b3 [T*T] float64 pm
//   fp_bits (sorted asc) / fp_scores [n_fp]
//   weights [6]: w_qed, w_sa, w_lipinski, logp_k, logp_lo, logp_hi
//   out_rewards [B] float32
//   out_terms   [B*6] float64 (valid,qed,sa,logp,lipinski,mw) or null
//   out_native  [B] u8: 1 = scored here
int cs_score_batch(const float* coords, const int32_t* types,
                   const uint8_t* mask, int B, int N, int T,
                   const int32_t* elem_codes,
                   const double* b1, const double* b2, const double* b3,
                   const uint32_t* fp_bits, const float* fp_scores,
                   int64_t n_fp, const double* weights,
                   float* out_rewards, double* out_terms,
                   uint8_t* out_native) {
    const double w_qed = weights[0], w_sa = weights[1], w_lip = weights[2],
                 logp_k = weights[3], logp_lo = weights[4],
                 logp_hi = weights[5];
    int n_done = 0;
    for (int b = 0; b < B; ++b) {
        out_rewards[b] = 0.0f;
        out_native[b] = 1;
        if (out_terms)
            for (int t = 0; t < 6; ++t) out_terms[b * 6 + t] = 0.0;
        // compact masked atoms, preserving order
        std::vector<double> xyz;
        std::vector<int32_t> tt;
        for (int i = 0; i < N; ++i) {
            if (!mask[(size_t)b * N + i]) continue;
            const float* p = coords + ((size_t)b * N + i) * 3;
            xyz.push_back((double)p[0]);
            xyz.push_back((double)p[1]);
            xyz.push_back((double)p[2]);
            tt.push_back(types[(size_t)b * N + i]);
        }
        int n = (int)tt.size();
        if (n == 0) continue;
        if (n > 60) { out_native[b] = 0; continue; }
        Mol m;
        bool valid = perceive(xyz.data(), tt.data(), n, T, b1, b2, b3,
                              elem_codes, m);
        if (!valid) { ++n_done; continue; }  // reward 0, scored natively
        // rings were computed on the connectivity graph, which has the
        // same edge set as the final bond list; aromaticity is computed
        // in perceive()
        bool sa_ok = true;
        double sa_raw = sa_score_raw(m, fp_bits, fp_scores, n_fp, &sa_ok);
        if (!sa_ok) { out_native[b] = 0; continue; }  // fallback path
        double sa_norm = round2((10.0 - sa_raw) / 9.0);
        QedProps qp = qed_properties(m);
        double qedv = qed_from_props(qp);
        double logp_val = qp.alogp;
        int lip = lipinski_count(m, logp_val);
        double r = w_qed * qedv + w_sa * sa_norm + w_lip * (double)lip;
        if (logp_k > 0)
            r += sigmoid(logp_k * (logp_val - logp_lo))
                 * sigmoid(-logp_k * (logp_val - logp_hi));
        out_rewards[b] = (float)r;
        if (out_terms) {
            out_terms[b * 6 + 0] = 1.0;
            out_terms[b * 6 + 1] = qedv;
            out_terms[b * 6 + 2] = sa_norm;
            out_terms[b * 6 + 3] = logp_val;
            out_terms[b * 6 + 4] = (double)lip;
            out_terms[b * 6 + 5] = qp.mw;
        }
        ++n_done;
    }
    return n_done;
}

// Deterministic maximum-cardinality matching (blossom), exported so the
// Python perception path can share the native kekulization choice.
//   edges [m*2] -> out_match [n] (-1 unmatched).  Returns matching size.
int cg_max_matching(int n, int m, const int32_t* edges, int32_t* out_match) {
    Blossom bl(n);
    for (int e = 0; e < m; ++e)
        bl.add_edge(edges[2 * e], edges[2 * e + 1]);
    int sz = bl.solve();
    for (int i = 0; i < n; ++i) out_match[i] = bl.match[i];
    return sz;
}

}  // extern "C"
