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
#include <cstdlib>
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
  int start = 0, count = 0;   // leaf range into final_order (ref ids)
};

// Clip a triangle polygon to the axis slab [lo, hi] (Sutherland–Hodgman,
// two half-space passes) and return the bounds of the clipped polygon.
// Returns an empty AABB (mn>mx) when the triangle misses the slab.
static AABB clip_tri_to_slab(const float* v /* 9 floats */, int axis,
                             float lo, float hi) {
  float poly[9][3];
  int np = 3;
  for (int i = 0; i < 3; ++i)
    for (int k = 0; k < 3; ++k) poly[i][k] = v[3 * i + k];
  float out[9][3];
  auto clip_half = [&](float plane, float sign) {  // keep sign*(x-plane) >= 0
    int m = 0;
    for (int i = 0; i < np; ++i) {
      const float* a = poly[i];
      const float* b = poly[(i + 1) % np];
      float da = sign * (a[axis] - plane);
      float db = sign * (b[axis] - plane);
      if (da >= 0.f) {
        for (int k = 0; k < 3; ++k) out[m][k] = a[k];
        ++m;
      }
      if ((da < 0.f) != (db < 0.f)) {
        float t = da / (da - db);
        for (int k = 0; k < 3; ++k) out[m][k] = a[k] + t * (b[k] - a[k]);
        ++m;
      }
    }
    np = m;
    for (int i = 0; i < np; ++i)
      for (int k = 0; k < 3; ++k) poly[i][k] = out[i][k];
  };
  clip_half(lo, 1.f);
  if (np) clip_half(hi, -1.f);
  AABB r;
  for (int i = 0; i < np; ++i) r.grow(poly[i]);
  if (np) {  // numeric safety: the slab bounds are exact by construction
    r.mn[axis] = std::max(r.mn[axis], lo);
    r.mx[axis] = std::min(r.mx[axis], hi);
  }
  return r;
}

static AABB intersect_aabb(const AABB& a, const AABB& b) {
  AABB r;
  for (int k = 0; k < 3; ++k) {
    r.mn[k] = std::max(a.mn[k], b.mn[k]);
    r.mx[k] = std::min(a.mx[k], b.mx[k]);
  }
  return r;
}

static bool aabb_valid(const AABB& a) {
  return a.mn[0] <= a.mx[0] && a.mn[1] <= a.mx[1] && a.mn[2] <= a.mx[2];
}

// The builder works on REFERENCES (tri id + clipped bounds), the SBVH idea
// (Stich et al. 2009): when the best object partition's children overlap,
// a spatial split may be cheaper — triangles straddling the split plane get
// one clipped reference on each side. On TPU the payoff is the same as on
// GPUs (fewer overlapping rows visited per ray = fewer gathers), and the
// clipped leaf bounds are honored at refit via the per-leaf clip boxes
// (mrt_wide_fetch_clip; wide.refit intersects computed leaf bounds with
// them — static geometry only, stale clips would cut deformed skins).
struct Builder {
  const float* verts;  // (T, 9)
  int n_tris;
  int leaf_k;
  bool spatial;
  int max_refs;     // duplication budget (SBVH unsplits refs beyond it)
  float root_area;  // for the alpha gate
  std::vector<AABB> ref_bounds;  // per ref: clipped bounds
  std::vector<int> ref_tri;      // per ref: triangle id
  std::vector<float> centroids;  // per ref (3*): tri centroid, box center
                                 // after a spatial split
  std::vector<int> final_order;  // refs in leaf-emission order
  std::vector<BinNode> nodes;

  // Stich's overlap gate; env-tunable for offline alpha sweeps
  static float sbvh_alpha() {
    static float a = [] {
      const char* e = std::getenv("MRT_SBVH_ALPHA");
      return e ? (float)std::atof(e) : 1e-5f;
    }();
    return a;
  }

  int add_ref(int tri, const AABB& b) {
    ref_tri.push_back(tri);
    ref_bounds.push_back(b);
    for (int k = 0; k < 3; ++k)
      centroids.push_back(0.5f * (b.mn[k] + b.mx[k]));
    return (int)ref_tri.size() - 1;
  }

  int build_binary(std::vector<int> refs) {
    BinNode node;
    const int count = (int)refs.size();
    AABB cb;  // centroid bounds
    for (int r : refs) {
      node.bounds.grow(ref_bounds[r]);
      cb.grow(&centroids[3 * r]);
    }
    // Split to SINGLETON leaves: the DP collapse below owns leaf formation
    // (it can merge any <=LEAF_K-triangle subtree into one leaf row), so the
    // binary phase only provides topology options, never forces a leaf.
    if (count <= 1) {
      node.start = (int)final_order.size();
      node.count = count;
      for (int r : refs) final_order.push_back(r);
      nodes.push_back(node);
      return (int)nodes.size() - 1;
    }

    float ext[3];
    for (int k = 0; k < 3; ++k) ext[k] = cb.mx[k] - cb.mn[k];

    std::vector<int> lrefs, rrefs;
    if (count <= 64) {
      // exact sweep with the FLAT-ROW cost model: a subtree of c tris costs
      // at least ceil(c/LEAF_K) leaf rows of ~this area, so weigh areas by
      // row count, not triangle count (matches the DP collapse objective)
      float best_cost = FLT_MAX;
      int best_axis = -1, best_pos = -1;
      static thread_local std::vector<int> tmp;
      static thread_local std::vector<float> larea;
      tmp = refs;
      larea.resize(count);
      for (int axis = 0; axis < 3; ++axis) {
        if (ext[axis] < 1e-12f) continue;
        std::sort(tmp.begin(), tmp.end(), [&](int a, int c) {
          return centroids[3 * a + axis] < centroids[3 * c + axis];
        });
        AABB acc;
        for (int i = 0; i < count - 1; ++i) {
          acc.grow(ref_bounds[tmp[i]]);
          larea[i] = acc.area();
        }
        AABB racc;
        for (int i = count - 1; i >= 1; --i) {
          racc.grow(ref_bounds[tmp[i]]);
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
        lrefs.assign(tmp.begin(), tmp.begin() + best_pos);
        rrefs.assign(tmp.begin() + best_pos, tmp.end());
      }
    } else {
      // binned SAH over the widest centroid axis (3-axis binning measured
      // WORSE under the DP collapse — tree_quality round 4)
      float best_cost = FLT_MAX;
      int best_axis = -1, best_split = -1;
      AABB best_lb, best_rb;  // for the overlap (alpha) gate
      int wax = 0;
      if (ext[1] > ext[wax]) wax = 1;
      if (ext[2] > ext[wax]) wax = 2;
      for (int axis = wax; axis <= wax; ++axis) {
        if (ext[axis] < 1e-12f) continue;
        AABB bin_bounds[NBINS];
        int bin_count[NBINS] = {0};
        float scale = NBINS / ext[axis];
        auto bin_of = [&](int r) {
          int b = (int)((centroids[3 * r + axis] - cb.mn[axis]) * scale);
          return std::min(std::max(b, 0), NBINS - 1);
        };
        for (int r : refs) {
          int b = bin_of(r);
          bin_count[b]++;
          bin_bounds[b].grow(ref_bounds[r]);
        }
        float right_area[NBINS];
        AABB right_box[NBINS];
        AABB acc;
        int right_count[NBINS];
        int rc = 0;
        for (int b = NBINS - 1; b >= 1; --b) {
          acc.grow(bin_bounds[b]);
          rc += bin_count[b];
          right_area[b] = acc.area();
          right_box[b] = acc;
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
            best_lb = lacc;
            best_rb = right_box[b + 1];
          }
        }
      }

      // SBVH spatial-split candidate: evaluated only when the best object
      // split's children overlap more than ALPHA of the root area (Stich's
      // gate bounds reference duplication to where it pays).
      bool spatial_won = false;
      int sp_axis = -1, sp_split = -1;
      float sp_lo = 0.f, sp_width = 0.f;
      if (spatial && best_axis >= 0 &&
          intersect_aabb(best_lb, best_rb).area() > sbvh_alpha() * root_area) {
        // widest node axis ONLY: 3-axis spatial binning ranked strictly
        // worse offline (camera 7.29 vs 5.79 used pops, app scene), the
        // same pattern as 3-axis object binning under the DP collapse
        int axis = 0;
        float nxt[3] = {node.bounds.mx[0] - node.bounds.mn[0],
                        node.bounds.mx[1] - node.bounds.mn[1],
                        node.bounds.mx[2] - node.bounds.mn[2]};
        if (nxt[1] > nxt[axis]) axis = 1;
        if (nxt[2] > nxt[axis]) axis = 2;
        float lo = node.bounds.mn[axis];
        float extent = nxt[axis];
        if (extent > 1e-12f) {
          float width = extent / NBINS;
          AABB bin_bounds[NBINS];
          int entry[NBINS] = {0}, exit_[NBINS] = {0};
          for (int r : refs) {
            const AABB& rb = ref_bounds[r];
            int b0 = std::min(std::max((int)((rb.mn[axis] - lo) / width), 0),
                              NBINS - 1);
            int b1 = std::min(std::max((int)((rb.mx[axis] - lo) / width), 0),
                              NBINS - 1);
            entry[b0]++;
            exit_[b1]++;
            if (b0 == b1) {
              bin_bounds[b0].grow(rb);
            } else {
              const float* tv = verts + 9 * ref_tri[r];
              for (int b = b0; b <= b1; ++b) {
                AABB c = clip_tri_to_slab(tv, axis, lo + b * width,
                                          lo + (b + 1) * width);
                c = intersect_aabb(c, rb);
                if (aabb_valid(c)) bin_bounds[b].grow(c);
              }
            }
          }
          float right_area[NBINS];
          AABB acc;
          int right_count[NBINS];
          int rc = 0;
          for (int b = NBINS - 1; b >= 1; --b) {
            acc.grow(bin_bounds[b]);
            rc += exit_[b];
            right_area[b] = acc.area();
            right_count[b] = rc;
          }
          AABB lacc;
          int lc = 0;
          for (int b = 0; b < NBINS - 1; ++b) {
            lacc.grow(bin_bounds[b]);
            lc += entry[b];
            int rcnt = right_count[b + 1];
            if (lc == 0 || rcnt == 0) continue;
            float cost = lacc.area() * lc + right_area[b + 1] * rcnt;
            if (cost < best_cost) {
              best_cost = cost;
              spatial_won = true;
              sp_axis = axis;
              sp_split = b;
              sp_lo = lo;
              sp_width = width;
            }
          }
        }
      }

      if (spatial_won) {
        float x = sp_lo + (sp_split + 1) * sp_width;
        for (int r : refs) {
          const AABB& rb = ref_bounds[r];
          if (rb.mx[sp_axis] <= x) {
            lrefs.push_back(r);
          } else if (rb.mn[sp_axis] >= x) {
            rrefs.push_back(r);
          } else if ((int)ref_tri.size() < max_refs) {
            const float* tv = verts + 9 * ref_tri[r];
            AABB lb = intersect_aabb(clip_tri_to_slab(tv, sp_axis,
                                                      rb.mn[sp_axis], x), rb);
            AABB rb2 = intersect_aabb(clip_tri_to_slab(tv, sp_axis,
                                                       x, rb.mx[sp_axis]), rb);
            if (!aabb_valid(lb)) {
              rrefs.push_back(r);
            } else if (!aabb_valid(rb2)) {
              lrefs.push_back(r);
            } else {
              ref_bounds[r] = lb;
              for (int k = 0; k < 3; ++k)
                centroids[3 * r + k] = 0.5f * (lb.mn[k] + lb.mx[k]);
              lrefs.push_back(r);
              rrefs.push_back(add_ref(ref_tri[r], rb2));
            }
          } else {  // budget exhausted: unsplit to the nearer side
            float c = 0.5f * (rb.mn[sp_axis] + rb.mx[sp_axis]);
            (c <= x ? lrefs : rrefs).push_back(r);
          }
        }
        if (lrefs.empty() || rrefs.empty()) {  // degenerate: fall back
          lrefs.clear();
          rrefs.clear();
          spatial_won = false;
        }
      }
      if (!spatial_won && best_axis >= 0) {
        int axis = best_axis;
        float scale = NBINS / ext[axis];
        int bs = best_split;
        for (int r : refs) {
          int bb = (int)((centroids[3 * r + axis] - cb.mn[axis]) * scale);
          bb = std::min(std::max(bb, 0), NBINS - 1);
          (bb <= bs ? lrefs : rrefs).push_back(r);
        }
        if (lrefs.empty() || rrefs.empty()) {
          lrefs.clear();
          rrefs.clear();
        }
      }
    }
    if (lrefs.empty() || rrefs.empty()) {  // degenerate: median split
      lrefs.clear();
      rrefs.clear();
      int mid = count / 2;
      lrefs.assign(refs.begin(), refs.begin() + mid);
      rrefs.assign(refs.begin() + mid, refs.end());
    }
    refs.clear();
    refs.shrink_to_fit();  // free before recursing: keeps peak memory O(n)

    int left = build_binary(std::move(lrefs));
    int right = build_binary(std::move(rrefs));
    node.left = left;
    node.right = right;
    node.start = nodes[left].start;
    node.count = nodes[left].count + nodes[right].count;
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
static thread_local std::vector<float> g_leaf_clip;  // (nl, 6) mn xyz, mx xyz
static thread_local int32_t g_ni = 0, g_nl = 0, g_depth = 0;

// spatial != 0 enables SBVH reference splitting (Stich et al. 2009 adapted
// to the flat-row cost model); use 0 for refittable (skinned) geometry —
// the clipped leaf bounds are only valid for the vertices the builder saw.
int mrt_build_wide_bvh_sp(const float* verts, int n_tris, int arity,
                          int leaf_k, int spatial) {
  if (n_tris <= 0 || arity < 2 || arity > 32 || leaf_k < 1) return 1;
  const int ARITY = arity;
  const int LEAF_K = leaf_k;
  Builder b;
  b.verts = verts;
  b.n_tris = n_tris;
  b.leaf_k = leaf_k;
  b.spatial = spatial != 0;
  b.max_refs = n_tris + n_tris / 2;  // ≤1.5x reference duplication
  b.ref_bounds.reserve(b.max_refs + 8);
  b.ref_tri.reserve(b.max_refs + 8);
  b.centroids.reserve(3 * (b.max_refs + 8));
  b.final_order.reserve(b.max_refs + 8);
  std::vector<int> all(n_tris);
  AABB root_box;
  for (int t = 0; t < n_tris; ++t) {
    const float* v = verts + 9 * t;
    AABB tb;
    tb.grow(v);
    tb.grow(v + 3);
    tb.grow(v + 6);
    all[t] = b.add_ref(t, tb);
    // v2 compat: initial centroids are TRIANGLE centroids (box centers only
    // after a spatial split) — keeps spatial=0 output identical to v2
    for (int k = 0; k < 3; ++k)
      b.centroids[3 * t + k] = (v[k] + v[3 + k] + v[6 + k]) / 3.f;
    root_box.grow(tb);
  }
  b.root_area = root_box.area();
  b.nodes.reserve(3 * n_tris);
  int root = b.build_binary(std::move(all));

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

  // Tail-aware depth weighting (round 5, VERDICT r4 item 4): the plain DP
  // minimizes MEAN pops/ray (sum of emitted-row areas); dragon-class deep
  // trees leave a bounce p90/max tail the mean cannot see. Scaling the
  // child-forest term by gamma > 1 makes an emitted row cost
  // area * gamma^depth — a convex surrogate that trades a little mean for
  // a flatter tree. gamma = 1 is the shipped objective.
  float gamma = 1.0f;
  if (const char* gs = std::getenv("MRT_COLLAPSE_GAMMA")) {
    float g = (float)atof(gs);
    if (g >= 1.0f && g <= 4.0f) gamma = g;
  }

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
    float c_int = area + gamma * D[ARITY];
    Cn[0] = std::min(c_leaf, c_int);
    for (int i = 2; i <= ARITY; ++i) Cn[i - 1] = std::min(Cn[i - 2], D[i]);
  }

  std::vector<std::vector<int>> node_child;  // >=0: internal idx, <0: -(leaf idx)-1
  std::vector<std::vector<int32_t>> leaves;

  std::vector<AABB> leaf_clips;

  auto make_leaf = [&](const BinNode& n) {
    std::vector<int32_t> row((size_t)LEAF_K, -1);
    AABB clip;
    int m = 0;
    for (int i = 0; i < n.count; ++i) {
      int r = b.final_order[n.start + i];
      clip.grow(b.ref_bounds[r]);
      int t = b.ref_tri[r];
      bool dup = false;  // two clipped refs of one tri can land in one leaf
      for (int j = 0; j < m; ++j)
        if (row[j] == t) { dup = true; break; }
      if (!dup && m < LEAF_K) row[m++] = t;
    }
    leaves.push_back(std::move(row));
    leaf_clips.push_back(clip);
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
  // clip boxes, grown by a safety margin so refit's float recomputation of
  // the same geometry can never be cut (refit itself pads by 1e-7)
  g_leaf_clip.resize((size_t)nl * 6);
  for (int i = 0; i < nl; ++i) {
    const AABB& c = leaf_clips[i];
    for (int k = 0; k < 3; ++k) {
      float eps = 1e-6f * std::max(std::fabs(c.mn[k]), std::fabs(c.mx[k]))
                + 1e-6f;
      g_leaf_clip[(size_t)i * 6 + k] = c.mn[k] - eps;
      g_leaf_clip[(size_t)i * 6 + 3 + k] = c.mx[k] + eps;
    }
  }

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

// Back-compat entry: object splits only (the v2 builder behavior).
int mrt_build_wide_bvh(const float* verts, int n_tris, int arity, int leaf_k) {
  return mrt_build_wide_bvh_sp(verts, n_tris, arity, leaf_k, 0);
}

int32_t mrt_wide_n_internal() { return g_ni; }
int32_t mrt_wide_n_leaves() { return g_nl; }
int32_t mrt_wide_depth() { return g_depth; }

void mrt_wide_fetch(int32_t* child_out, int32_t* leaf_out) {
  std::memcpy(child_out, g_child.data(), g_child.size() * sizeof(int32_t));
  std::memcpy(leaf_out, g_leaf.data(), g_leaf.size() * sizeof(int32_t));
}

// Per-leaf clip boxes (nl x 6 f32: mn xyz, mx xyz): the bounds the builder
// intended for each leaf row. With spatial splits these are TIGHTER than
// the union of full-triangle bounds; refit intersects with them (static
// geometry only).
void mrt_wide_fetch_clip(float* clip_out) {
  std::memcpy(clip_out, g_leaf_clip.data(), g_leaf_clip.size() * sizeof(float));
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
