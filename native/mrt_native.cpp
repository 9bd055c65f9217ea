// mrt_native — host-side native runtime components for the TPU path tracer.
//
// The reference delegates BVH construction to Metal's opaque hardware
// accelerated builder (Utilities.swift:37-290). Our TPU design builds
// topology on the host and refits AABBs on device; this library provides the
// production host builder: a binned-SAH top-down constructor emitting the
// wide (arity-ary, leaf_k-triangle-leaf — both caller parameters, matching
// mrt_tpu/bvh/wide.py's ARITY/LEAF_K) topology arrays the JAX side consumes,
// with measurably better tree quality than the Morton LBVH fallback (fewer
// node visits per ray = fewer gather rounds on TPU).
//
// v2 (round 4): the binary phase splits to SINGLETON leaves (exact sweep
// with a flat-row cost model under 64 tris, binned SAH above), and the
// binary->wide collapse is a dynamic program minimizing total emitted-row
// surface area — the TPU analog of SAH-guided wide collapse (Ylitie et al.
// 2017), where every row (internal OR leaf) costs one packed-row gather.
// Offline quality vs v1 on the app scene: camera pops/ray 7.59 -> 6.24,
// bounce 7.00 -> 5.59 (scripts/tree_quality.py, docs/PERF.md round 4e).
//
// C ABI, consumed via ctypes (no pybind11 in the image).
//
// Build: g++ -O3 -march=native -shared -fPIC mrt_native.cpp -o libmrt_native.so

#include <algorithm>
#include <array>
#include <cfloat>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr int NBINS = 16;

struct AABB {
  float mn[3] = {FLT_MAX, FLT_MAX, FLT_MAX};
  float mx[3] = {-FLT_MAX, -FLT_MAX, -FLT_MAX};
  void grow(const float* p) {
    for (int k = 0; k < 3; ++k) {
      mn[k] = std::min(mn[k], p[k]);
      mx[k] = std::max(mx[k], p[k]);
    }
  }
  void grow(const AABB& o) {
    for (int k = 0; k < 3; ++k) {
      mn[k] = std::min(mn[k], o.mn[k]);
      mx[k] = std::max(mx[k], o.mx[k]);
    }
  }
  float area() const {
    float dx = std::max(0.f, mx[0] - mn[0]);
    float dy = std::max(0.f, mx[1] - mn[1]);
    float dz = std::max(0.f, mx[2] - mn[2]);
    return 2.f * (dx * dy + dy * dz + dz * dx);
  }
};

struct BinNode {
  AABB bounds;
  int left = -1, right = -1;  // binary children (indices into nodes)
  int start = 0, count = 0;   // leaf range into tri_order
};

struct Builder {
  const float* verts;  // (T, 9)
  int n_tris;
  int leaf_k;
  std::vector<AABB> tri_bounds;
  std::vector<float> centroids;  // (T, 3)
  std::vector<int> order;        // permuted tri ids
  std::vector<BinNode> nodes;

  int build_binary(int start, int count) {
    BinNode node;
    node.start = start;
    node.count = count;
    AABB cb;  // centroid bounds
    for (int i = start; i < start + count; ++i) {
      node.bounds.grow(tri_bounds[order[i]]);
      cb.grow(&centroids[3 * order[i]]);
    }
    // Split to SINGLETON leaves: the DP collapse below owns leaf formation
    // (it can merge any <=LEAF_K-triangle subtree into one leaf row), so the
    // binary phase only provides topology options, never forces a leaf.
    if (count <= 1) {
      nodes.push_back(node);
      return (int)nodes.size() - 1;
    }

    float ext[3];
    for (int k = 0; k < 3; ++k) ext[k] = cb.mx[k] - cb.mn[k];

    int mid = -1;
    if (count <= 64) {
      // exact sweep with the FLAT-ROW cost model: a subtree of c tris costs
      // at least ceil(c/LEAF_K) leaf rows of ~this area, so weigh areas by
      // row count, not triangle count (matches the DP collapse objective)
      float best_cost = FLT_MAX;
      int best_axis = -1, best_pos = -1;
      static thread_local std::vector<int> tmp;
      static thread_local std::vector<float> larea;
      tmp.assign(order.begin() + start, order.begin() + start + count);
      larea.resize(count);
      for (int axis = 0; axis < 3; ++axis) {
        if (ext[axis] < 1e-12f) continue;
        std::sort(tmp.begin(), tmp.end(), [&](int a, int c) {
          return centroids[3 * a + axis] < centroids[3 * c + axis];
        });
        AABB acc;
        for (int i = 0; i < count - 1; ++i) {
          acc.grow(tri_bounds[tmp[i]]);
          larea[i] = acc.area();
        }
        AABB racc;
        for (int i = count - 1; i >= 1; --i) {
          racc.grow(tri_bounds[tmp[i]]);
          float cost = larea[i - 1] * ((i + leaf_k - 1) / leaf_k)
                     + racc.area() * ((count - i + leaf_k - 1) / leaf_k);
          if (cost < best_cost) {
            best_cost = cost;
            best_axis = axis;
            best_pos = i;
          }
        }
      }
      if (best_axis >= 0) {
        std::sort(tmp.begin(), tmp.end(), [&](int a, int c) {
          return centroids[3 * a + best_axis] < centroids[3 * c + best_axis];
        });
        std::copy(tmp.begin(), tmp.end(), order.begin() + start);
        mid = start + best_pos;
      }
    } else {
      // binned SAH over the widest centroid axis (3-axis binning measured
      // WORSE under the DP collapse — tree_quality round 4)
      float best_cost = FLT_MAX;
      int best_axis = -1, best_split = -1;
      int wax = 0;
      if (ext[1] > ext[wax]) wax = 1;
      if (ext[2] > ext[wax]) wax = 2;
      for (int axis = wax; axis <= wax; ++axis) {
        if (ext[axis] < 1e-12f) continue;
        AABB bin_bounds[NBINS];
        int bin_count[NBINS] = {0};
        float scale = NBINS / ext[axis];
        auto bin_of = [&](int tri) {
          int b = (int)((centroids[3 * tri + axis] - cb.mn[axis]) * scale);
          return std::min(std::max(b, 0), NBINS - 1);
        };
        for (int i = start; i < start + count; ++i) {
          int b = bin_of(order[i]);
          bin_count[b]++;
          bin_bounds[b].grow(tri_bounds[order[i]]);
        }
        float right_area[NBINS];
        AABB acc;
        int right_count[NBINS];
        int rc = 0;
        for (int b = NBINS - 1; b >= 1; --b) {
          acc.grow(bin_bounds[b]);
          rc += bin_count[b];
          right_area[b] = acc.area();
          right_count[b] = rc;
        }
        AABB lacc;
        int lc = 0;
        for (int b = 0; b < NBINS - 1; ++b) {
          lacc.grow(bin_bounds[b]);
          lc += bin_count[b];
          if (lc == 0 || lc == count) continue;
          float cost = lacc.area() * lc + right_area[b + 1] * right_count[b + 1];
          if (cost < best_cost) {
            best_cost = cost;
            best_axis = axis;
            best_split = b;
          }
        }
      }
      if (best_axis >= 0) {
        int axis = best_axis;
        float scale = NBINS / ext[axis];
        int bs = best_split;
        auto it = std::partition(
            order.begin() + start, order.begin() + start + count, [&](int tri) {
              int bb = (int)((centroids[3 * tri + axis] - cb.mn[axis]) * scale);
              return std::min(std::max(bb, 0), NBINS - 1) <= bs;
            });
        mid = (int)(it - order.begin());
        if (mid == start || mid == start + count) mid = -1;
      }
    }
    if (mid < 0) mid = start + count / 2;  // degenerate: median split

    int left = build_binary(start, mid - start);
    int right = build_binary(mid, start + count - mid);
    node.left = left;
    node.right = right;
    nodes.push_back(node);
    return (int)nodes.size() - 1;
  }
};

}  // namespace

extern "C" {

// Builds the wide topology. Returns 0 on success.
// verts: (n_tris, 9) float32 [v0 v1 v2].
// Outputs written through the query/fetch pair: call mrt_build_wide_bvh to
// build into thread-local storage, then sizes + fetch.
static thread_local std::vector<int32_t> g_child;
static thread_local std::vector<int32_t> g_leaf;
static thread_local int32_t g_ni = 0, g_nl = 0, g_depth = 0;

int mrt_build_wide_bvh(const float* verts, int n_tris, int arity, int leaf_k) {
  if (n_tris <= 0 || arity < 2 || arity > 32 || leaf_k < 1) return 1;
  const int ARITY = arity;
  const int LEAF_K = leaf_k;
  Builder b;
  b.verts = verts;
  b.n_tris = n_tris;
  b.leaf_k = leaf_k;
  b.tri_bounds.resize(n_tris);
  b.centroids.resize(3 * n_tris);
  b.order.resize(n_tris);
  for (int t = 0; t < n_tris; ++t) {
    b.order[t] = t;
    const float* v = verts + 9 * t;
    b.tri_bounds[t].grow(v);
    b.tri_bounds[t].grow(v + 3);
    b.tri_bounds[t].grow(v + 6);
    for (int k = 0; k < 3; ++k)
      b.centroids[3 * t + k] = (v[k] + v[3 + k] + v[6 + k]) / 3.f;
  }
  b.nodes.reserve(2 * n_tris);
  int root = b.build_binary(0, n_tris);

  // --------------------------------------------------------------------
  // Optimal binary->wide collapse by dynamic programming (the SAH-guided
  // collapse family of Ylitie et al. 2017, re-derived for the TPU cost
  // model): on TPU every traversal step is ONE packed-row gather whether
  // the row is internal (ARITY AABBs) or leaf (LEAF_K triangles), so the
  // cost of an emitted wide entry is FLAT and the expected pops/ray of a
  // tree is sum(area(entry))/area(root) over all emitted entries. The DP
  // therefore minimizes the summed surface area of emitted rows.
  //
  //   C(n, i) = min cost of covering binary subtree n with a forest of at
  //             most i wide-entry roots
  //   D(n, i) = min_{1<=k<i} C(left, k) + C(right, i-k)   (split forest)
  //   C(n, 1) = min( A(n)          if count(n) <= LEAF_K   [leaf row]
  //               ,  A(n) + D(n, ARITY) )                  [internal row]
  //   C(n, i) = min( C(n, i-1), D(n, i) )                  i in 2..ARITY
  //
  // nodes[] is in postorder (children precede parents), so the DP is one
  // forward pass; reconstruction recomputes argmins from the C table.
  // --------------------------------------------------------------------
  const int NB = (int)b.nodes.size();
  std::vector<float> C((size_t)NB * ARITY);
  const float INF = FLT_MAX / 4;

  for (int n = 0; n < NB; ++n) {
    const BinNode& nd = b.nodes[n];
    float* Cn = &C[(size_t)n * ARITY];
    float area = nd.bounds.area();
    if (nd.left < 0) {  // singleton binary leaf: must be its own leaf row
      for (int i = 0; i < ARITY; ++i) Cn[i] = area;
      continue;
    }
    const float* Cl = &C[(size_t)nd.left * ARITY];
    const float* Cr = &C[(size_t)nd.right * ARITY];
    float D[/*ARITY+1*/ 64];
    for (int i = 2; i <= ARITY; ++i) {
      float best = INF;
      for (int k = 1; k < i; ++k) {
        float c = Cl[k - 1] + Cr[i - k - 1];
        if (c < best) best = c;
      }
      D[i] = best;
    }
    float c_leaf = nd.count <= LEAF_K ? area : INF;
    float c_int = area + D[ARITY];
    Cn[0] = std::min(c_leaf, c_int);
    for (int i = 2; i <= ARITY; ++i) Cn[i - 1] = std::min(Cn[i - 2], D[i]);
  }

  std::vector<std::vector<int>> node_child;  // >=0: internal idx, <0: -(leaf idx)-1
  std::vector<std::vector<int32_t>> leaves;

  auto make_leaf = [&](const BinNode& n) {
    std::vector<int32_t> row((size_t)LEAF_K, -1);
    for (int i = 0; i < n.count && i < LEAF_K; ++i) row[i] = b.order[n.start + i];
    leaves.push_back(std::move(row));
    return -(int)leaves.size();  // -(idx)-1
  };

  // forest_roots(n, i): binary subtree roots realizing C(n, i).
  auto forest_roots = [&](int n, int i, std::vector<int>& out) {
    struct F { int n, i; };
    std::vector<F> st{{n, i}};
    while (!st.empty()) {
      F f = st.back();
      st.pop_back();
      const BinNode& nd = b.nodes[f.n];
      const float* Cn = &C[(size_t)f.n * ARITY];
      if (nd.left < 0) { out.push_back(f.n); continue; }
      const float* Cl = &C[(size_t)nd.left * ARITY];
      const float* Cr = &C[(size_t)nd.right * ARITY];
      int i2 = f.i;
      while (i2 > 1 && Cn[i2 - 1] == Cn[i2 - 2]) --i2;  // carried from i-1
      if (i2 == 1) { out.push_back(f.n); continue; }
      int bk = 1;
      float best = INF;
      for (int k = 1; k < i2; ++k) {
        float c = Cl[k - 1] + Cr[i2 - k - 1];
        if (c < best) { best = c; bk = k; }
      }
      // split order: left forest then right forest (preorder-ish)
      st.push_back({nd.right, i2 - bk});
      st.push_back({nd.left, bk});
    }
  };

  struct Work {
    int wide_idx;
    int bin_idx;
  };
  std::vector<Work> work;
  {
    const BinNode& rn = b.nodes[root];
    float c_leaf = rn.count <= LEAF_K ? rn.bounds.area() : INF;
    if (rn.left < 0 || c_leaf <= C[(size_t)root * ARITY]) {
      node_child.push_back(std::vector<int>{make_leaf(rn)});
    } else {
      node_child.push_back({});
      work.push_back({0, root});
    }
  }

  while (!work.empty()) {
    Work w = work.back();
    work.pop_back();
    // Internal-row decomposition = D(n, ARITY): split left/right at the
    // argmin FIRST (keep-whole is not an option for an emitted internal —
    // a node cannot be its own child), then realize each side via C.
    const BinNode& wn = b.nodes[w.bin_idx];
    const float* Cl = &C[(size_t)wn.left * ARITY];
    const float* Cr = &C[(size_t)wn.right * ARITY];
    int bk = 1;
    float best = INF;
    for (int k = 1; k < ARITY; ++k) {
      float c = Cl[k - 1] + Cr[ARITY - k - 1];
      if (c < best) { best = c; bk = k; }
    }
    std::vector<int> roots;
    forest_roots(wn.left, bk, roots);
    forest_roots(wn.right, ARITY - bk, roots);
    std::vector<int> children;
    for (int r : roots) {
      const BinNode& n = b.nodes[r];
      float c_leaf = n.count <= LEAF_K ? n.bounds.area() : INF;
      // emit r as realizing C(r, 1): leaf row when the leaf option won
      if (n.left < 0 || c_leaf <= C[(size_t)r * ARITY]) {
        children.push_back(make_leaf(n));
      } else {
        node_child.push_back({});
        children.push_back((int)node_child.size() - 1);
        work.push_back({(int)node_child.size() - 1, r});
      }
    }
    node_child[w.wide_idx] = children;
  }

  int ni = (int)node_child.size();
  int nl = (int)leaves.size();
  g_child.assign((size_t)ni * ARITY, -1);
  for (int i = 0; i < ni; ++i) {
    for (int j = 0; j < (int)node_child[i].size() && j < ARITY; ++j) {
      int c = node_child[i][j];
      g_child[(size_t)i * ARITY + j] = c >= 0 ? c : ni + (-c - 1);
    }
  }
  g_leaf.assign((size_t)nl * LEAF_K, -1);
  for (int i = 0; i < nl; ++i)
    for (int j = 0; j < LEAF_K; ++j) g_leaf[(size_t)i * LEAF_K + j] = leaves[i][j];

  // depth (refit trip count)
  std::vector<int32_t> depth(ni, 1);
  for (int i = ni - 1; i >= 0; --i)
    for (int j = 0; j < ARITY; ++j) {
      int c = g_child[(size_t)i * ARITY + j];
      if (c >= 0 && c < ni) depth[i] = std::max(depth[i], depth[c] + 1);
    }
  g_ni = ni;
  g_nl = nl;
  g_depth = ni > 0 ? depth[0] + 1 : 1;
  return 0;
}

int32_t mrt_wide_n_internal() { return g_ni; }
int32_t mrt_wide_n_leaves() { return g_nl; }
int32_t mrt_wide_depth() { return g_depth; }

void mrt_wide_fetch(int32_t* child_out, int32_t* leaf_out) {
  std::memcpy(child_out, g_child.data(), g_child.size() * sizeof(int32_t));
  std::memcpy(leaf_out, g_leaf.data(), g_leaf.size() * sizeof(int32_t));
}

// ---------------------------------------------------------------------------
// Fast OBJ triangle counter/parser (geometry only; materials stay in Python).
// Two-phase: mrt_obj_open parses into TLS; counts + fetch + close.
// ---------------------------------------------------------------------------

static thread_local std::vector<float> g_pos, g_uv, g_nrm;
static thread_local std::vector<int32_t> g_idx;

int mrt_obj_parse(const char* text, int64_t len) {
  std::vector<std::array<float, 3>> vs;
  std::vector<std::array<float, 2>> vts;
  std::vector<std::array<float, 3>> vns;
  struct Key {
    int v, t, n;
    bool operator==(const Key& o) const { return v == o.v && t == o.t && n == o.n; }
  };
  struct KeyHash {
    size_t operator()(const Key& k) const {
      return ((size_t)k.v * 73856093u) ^ ((size_t)k.t * 19349663u) ^ ((size_t)k.n * 83492791u);
    }
  };
  g_pos.clear();
  g_uv.clear();
  g_nrm.clear();
  g_idx.clear();

  // simple open-addressing map
  std::vector<std::pair<Key, int>> map_table;
  size_t cap = 1;
  auto rehash = [&](size_t newcap) {
    std::vector<std::pair<Key, int>> nt(newcap, {{-2, -2, -2}, -1});
    for (auto& e : map_table)
      if (e.second >= 0) {
        size_t h = KeyHash{}(e.first) & (newcap - 1);
        while (nt[h].second >= 0) h = (h + 1) & (newcap - 1);
        nt[h] = e;
      }
    map_table.swap(nt);
    cap = newcap;
  };
  rehash(1 << 12);
  size_t used = 0;

  auto corner = [&](int v, int t, int n) -> int {
    if (v > 0) v -= 1; else v = (int)vs.size() + v;
    if (t > 0) t -= 1; else if (t < 0) t = (int)vts.size() + t; else t = -1;
    if (n > 0) n -= 1; else if (n < 0) n = (int)vns.size() + n; else n = -1;
    // malformed/truncated OBJ: out-of-range references are a recoverable
    // error (caller falls back to the pure-NumPy parser), not UB
    if (v < 0 || v >= (int)vs.size()) return -1;
    if (t >= (int)vts.size()) t = -1;
    if (n >= (int)vns.size()) n = -1;
    Key k{v, t, n};
    size_t h = KeyHash{}(k) & (cap - 1);
    while (map_table[h].second >= 0) {
      if (map_table[h].first == k) return map_table[h].second;
      h = (h + 1) & (cap - 1);
    }
    int idx = (int)(g_pos.size() / 3);
    map_table[h] = {k, idx};
    if (++used * 2 > cap) rehash(cap * 2);
    g_pos.insert(g_pos.end(), vs[v].begin(), vs[v].end());
    if (t >= 0) {
      g_uv.push_back(vts[t][0]);
      g_uv.push_back(vts[t][1]);
    } else {
      g_uv.push_back(0);
      g_uv.push_back(0);
    }
    if (n >= 0)
      g_nrm.insert(g_nrm.end(), vns[n].begin(), vns[n].end());
    else {
      g_nrm.push_back(NAN);
      g_nrm.push_back(NAN);
      g_nrm.push_back(NAN);
    }
    return idx;
  };

  const char* p = text;
  const char* end = text + len;
  while (p < end) {
    // skip leading whitespace
    while (p < end && (*p == ' ' || *p == '\t' || *p == '\r' || *p == '\n')) ++p;
    if (p >= end) break;
    const char* line_end = (const char*)memchr(p, '\n', end - p);
    if (!line_end) line_end = end;
    if (p[0] == 'v' && p[1] == ' ') {
      char* q;
      float x = strtof(p + 2, &q), y = strtof(q, &q), z = strtof(q, &q);
      vs.push_back({x, y, z});
    } else if (p[0] == 'v' && p[1] == 't') {
      char* q;
      float u = strtof(p + 3, &q), v = strtof(q, &q);
      vts.push_back({u, v});
    } else if (p[0] == 'v' && p[1] == 'n') {
      char* q;
      float x = strtof(p + 3, &q), y = strtof(q, &q), z = strtof(q, &q);
      vns.push_back({x, y, z});
    } else if (p[0] == 'f' && (p[1] == ' ' || p[1] == '\t')) {
      int ids[64];
      int nids = 0;
      const char* q = p + 2;
      while (q < line_end && nids < 64) {
        while (q < line_end && (*q == ' ' || *q == '\t')) ++q;
        if (q >= line_end) break;
        char* r;
        long v = strtol(q, &r, 10);
        long t = 0, n = 0;
        if (r < line_end && *r == '/') {
          ++r;
          if (*r != '/') t = strtol(r, &r, 10);
          if (r < line_end && *r == '/') {
            ++r;
            n = strtol(r, &r, 10);
          }
        }
        if (r == q) break;
        q = r;
        int c = corner((int)v, (int)t, (int)n);
        if (c < 0) return 2;  // out-of-range vertex reference
        ids[nids++] = c;
      }
      for (int k = 1; k + 1 < nids; ++k) {
        g_idx.push_back(ids[0]);
        g_idx.push_back(ids[k]);
        g_idx.push_back(ids[k + 1]);
      }
    }
    p = line_end + 1;
  }
  return 0;
}

int64_t mrt_obj_n_vertices() { return (int64_t)(g_pos.size() / 3); }
int64_t mrt_obj_n_triangles() { return (int64_t)(g_idx.size() / 3); }

void mrt_obj_fetch(float* pos, float* uv, float* nrm, int32_t* idx) {
  std::memcpy(pos, g_pos.data(), g_pos.size() * sizeof(float));
  std::memcpy(uv, g_uv.data(), g_uv.size() * sizeof(float));
  std::memcpy(nrm, g_nrm.data(), g_nrm.size() * sizeof(float));
  std::memcpy(idx, g_idx.data(), g_idx.size() * sizeof(int32_t));
}

}  // extern "C"
