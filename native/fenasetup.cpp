// fenasetup: native host-side setup kernels for fenapack_tpu.
//
// TPU-native analogue of the C++ setup substrate the reference rides on
// (DOLFIN mesh topology + dofmap construction, SURVEY.md section 2.2 items
// 6-8): the device compute path is JAX/Pallas, but sparsity-pattern and mesh
// -topology construction are host-side index crunching, dominated by
// sort-unique over packed integer keys.  NumPy's comparison sort costs ~11 s
// per 17M keys at 3D scale; the LSD radix sort here is ~10x faster on the
// single host core and keeps the 2M-DoF (config 4) setup path usable.
//
// Build: g++ -O3 -std=c++17 -shared -fPIC fenasetup.cpp -o _fenasetup.so
// (driven by fenapack_tpu/native/__init__.py, which falls back to NumPy when
// no compiler is available).
#include <cstdint>
#include <cstring>
#include <vector>
#include <algorithm>

namespace {

struct KV {
  int64_t k;
  int64_t v;
};

// LSD radix passes over one bucket that fits in cache.
void lsd_radix_bucket(KV* a, int64_t n, KV* buf, int hi_bits) {
  if (n <= 1) return;
  if (n <= 48) {           // insertion sort beats radix at tiny sizes
    for (int64_t i = 1; i < n; ++i) {
      KV x = a[i];
      int64_t j = i - 1;
      while (j >= 0 && a[j].k > x.k) { a[j + 1] = a[j]; --j; }
      a[j + 1] = x;
    }
    return;
  }
  KV* src = a;
  KV* dst = buf;
  for (int shift = 0; shift < hi_bits; shift += 8) {
    int64_t count[256] = {0};
    for (int64_t i = 0; i < n; ++i)
      ++count[(static_cast<uint64_t>(src[i].k) >> shift) & 0xffu];
    if (count[(static_cast<uint64_t>(src[0].k) >> shift) & 0xffu] == n)
      continue;                          // constant digit: skip pass
    int64_t pos[256];
    int64_t run = 0;
    for (int d = 0; d < 256; ++d) { pos[d] = run; run += count[d]; }
    for (int64_t i = 0; i < n; ++i)
      dst[pos[(static_cast<uint64_t>(src[i].k) >> shift) & 0xffu]++] = src[i];
    std::swap(src, dst);
  }
  if (src != a) std::memcpy(a, src, sizeof(KV) * n);
}

// Cache-aware sort of (key, tag) pairs: one MSD partition pass into ~2^PB
// buckets using 64-byte write-combining staging (4 KV per cache line keeps
// the random-scatter miss rate at 1/4 per element), then in-cache LSD radix
// per bucket.  ~4x faster than a straight LSD sort at 17M keys on the
// single-core host, whose DRAM-latency-bound scatter dominates otherwise.
void radix_sort_pairs(std::vector<KV>& a) {
  const int64_t n = static_cast<int64_t>(a.size());
  if (n <= 1) return;
  uint64_t maxk = 0;
  for (int64_t i = 0; i < n; ++i)
    maxk |= static_cast<uint64_t>(a[i].k);
  int key_bits = 64;
  while (key_bits > 1 && !(maxk >> (key_bits - 1))) --key_bits;

  constexpr int PB = 11;                 // up to 2048 buckets
  int pb = PB;
  // aim for bucket payloads ~0.5-1 MB (in L2); fewer buckets for small n
  while (pb > 0 && (n >> pb) < (1 << 14)) --pb;
  if (pb == 0 || key_bits <= pb) {
    std::vector<KV> buf(n);
    lsd_radix_bucket(a.data(), n, buf.data(), key_bits);
    return;
  }
  const int shift = key_bits - pb;
  const int64_t nb = int64_t(1) << pb;

  std::vector<int64_t> count(nb, 0);
  for (int64_t i = 0; i < n; ++i)
    ++count[static_cast<uint64_t>(a[i].k) >> shift];
  std::vector<int64_t> start(nb + 1);
  start[0] = 0;
  for (int64_t b = 0; b < nb; ++b) start[b + 1] = start[b] + count[b];

  std::vector<KV> out(n);
  {
    // write-combining staging: 4 KV (64 B) per bucket, flushed when full
    constexpr int W = 4;
    std::vector<KV> stage(nb * W);
    std::vector<int8_t> fill(nb, 0);
    std::vector<int64_t> pos(start.begin(), start.end() - 1);
    for (int64_t i = 0; i < n; ++i) {
      const int64_t b = static_cast<uint64_t>(a[i].k) >> shift;
      stage[b * W + fill[b]] = a[i];
      if (++fill[b] == W) {
        std::memcpy(&out[pos[b]], &stage[b * W], sizeof(KV) * W);
        pos[b] += W;
        fill[b] = 0;
      }
    }
    for (int64_t b = 0; b < nb; ++b)
      for (int f = 0; f < fill[b]; ++f) out[pos[b]++] = stage[b * W + f];
  }

  int64_t max_bucket = 0;
  for (int64_t b = 0; b < nb; ++b) max_bucket = std::max(max_bucket, count[b]);
  std::vector<KV> buf(max_bucket);
  for (int64_t b = 0; b < nb; ++b)
    lsd_radix_bucket(out.data() + start[b], count[b], buf.data(), shift);
  a.swap(out);
}

}  // namespace

extern "C" {

// np.unique(keys, return_inverse=True) for non-negative int64 keys:
// writes the sorted unique keys to uniq_out (capacity n) and the group index
// of every input key to inverse_out (size n); returns the unique count.
int64_t fena_unique_i64(const int64_t* keys, int64_t n,
                        int64_t* uniq_out, int64_t* inverse_out) {
  if (n == 0) return 0;
  std::vector<KV> a(n);
  for (int64_t i = 0; i < n; ++i) a[i] = {keys[i], i};
  radix_sort_pairs(a);
  int64_t u = -1;
  int64_t prev = ~a[0].k;  // != first key
  for (int64_t i = 0; i < n; ++i) {
    if (a[i].k != prev) {
      prev = a[i].k;
      uniq_out[++u] = prev;
    }
    inverse_out[a[i].v] = u;
  }
  return u + 1;
}

// Sorted-insertion positions of ``queries`` into the sorted unique ``uniq``
// (np.searchsorted); returns number of exact hits so the caller can verify
// containment cheaply.
int64_t fena_searchsorted_i64(const int64_t* uniq, int64_t nu,
                              const int64_t* queries, int64_t nq,
                              int64_t* pos_out) {
  int64_t hits = 0;
  for (int64_t i = 0; i < nq; ++i) {
    const int64_t* p = std::lower_bound(uniq, uniq + nu, queries[i]);
    pos_out[i] = p - uniq;
    hits += (p != uniq + nu && *p == queries[i]);
  }
  return hits;
}

// Reverse-Cuthill-McKee rank (old dof id -> new dof id) from a cell dofmap
// (nc, a): bandwidth reduction for the block-sparse operator layout.
// Matches scipy.sparse.csgraph.reverse_cuthill_mckee semantics (BFS from a
// minimum-degree vertex per component, neighbors visited in increasing
// degree order, final order reversed).
void fena_rcm_rank(const int32_t* cell_dofs, int64_t nc, int32_t a,
                   int32_t ndof, int32_t* rank_out) {
  // adjacency: unique (dof_i, dof_j) pairs within each cell, packed
  const int64_t e = nc * a * (a - 1);
  std::vector<KV> pk(e);
  int64_t t = 0;
  for (int64_t c = 0; c < nc; ++c) {
    const int32_t* cd = cell_dofs + c * a;
    for (int i = 0; i < a; ++i)
      for (int j = 0; j < a; ++j)
        if (i != j)
          pk[t++] = {static_cast<int64_t>(cd[i]) * ndof + cd[j], 0};
  }
  radix_sort_pairs(pk);
  // CSR from sorted unique pairs
  std::vector<int64_t> head(ndof + 1, 0);
  std::vector<int32_t> adj;
  adj.reserve(e);
  int64_t prev = e ? ~pk[0].k : 0;
  for (int64_t i = 0; i < e; ++i) {
    if (pk[i].k == prev) continue;
    prev = pk[i].k;
    int64_t r = pk[i].k / ndof;
    adj.push_back(static_cast<int32_t>(pk[i].k % ndof));
    ++head[r + 1];
  }
  for (int64_t r = 0; r < ndof; ++r) head[r + 1] += head[r];
  std::vector<int32_t> degree(ndof);
  for (int64_t r = 0; r < ndof; ++r)
    degree[r] = static_cast<int32_t>(head[r + 1] - head[r]);

  std::vector<int32_t> order;
  order.reserve(ndof);
  std::vector<uint8_t> seen(ndof, 0);
  std::vector<int32_t> nbrs;
  // min-degree seeds, ascending (isolated dofs included: degree 0)
  std::vector<int32_t> by_deg(ndof);
  for (int32_t v = 0; v < ndof; ++v) by_deg[v] = v;
  std::stable_sort(by_deg.begin(), by_deg.end(),
                   [&](int32_t x, int32_t y) { return degree[x] < degree[y]; });
  size_t seed_scan = 0;
  while (order.size() < static_cast<size_t>(ndof)) {
    while (seed_scan < by_deg.size() && seen[by_deg[seed_scan]]) ++seed_scan;
    int32_t s = by_deg[seed_scan];
    seen[s] = 1;
    order.push_back(s);
    for (size_t q = order.size() - 1; q < order.size(); ++q) {
      int32_t v = order[q];
      nbrs.clear();
      for (int64_t j = head[v]; j < head[v + 1]; ++j)
        if (!seen[adj[j]]) nbrs.push_back(adj[j]);
      std::stable_sort(nbrs.begin(), nbrs.end(), [&](int32_t x, int32_t y) {
        return degree[x] < degree[y];
      });
      for (int32_t w : nbrs) {
        seen[w] = 1;
        order.push_back(w);
      }
    }
  }
  for (int64_t i = 0; i < ndof; ++i)
    rank_out[order[i]] = static_cast<int32_t>(ndof - 1 - i);
}

}  // extern "C"
