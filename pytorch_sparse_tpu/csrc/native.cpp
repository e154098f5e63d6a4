// Native host-side kernels for pytorch_sparse_tpu.
//
// TPU-native counterpart of the reference's csrc/cpu sampling kernels
// (sample_cpu.cpp, neighbor_sample_cpu.cpp, saint_cpu.cpp,
// relabel_cpu.cpp, rw_cpu.cpp) and the METIS binding (metis_cpu.cpp):
// the device math lives in XLA/Pallas, but the irregular pointer-chasing
// (hash relabeling, per-row reservoir sampling, partition refinement)
// stays on the host and is implemented here in C++ behind a plain C ABI
// loaded via ctypes (no torch, no pybind).
//
// Contract notes:
//  * All index arrays are int64.
//  * Random draws use a per-call SplitMix64/xoshiro256** generator seeded
//    from the caller: same seed => identical output (the determinism
//    contract of csrc/cpu/utils.h:40-50).
//  * Output sizes that are data-dependent use a (count, fill) pair or
//    caller-computed exact bounds, documented per function.

#include <algorithm>
#include <cmath>
#include <cstdio>
#include <cstdlib>
#include <cstdint>
#include <cstring>
#include <queue>
#include <unordered_map>
#include <unordered_set>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

extern "C" {

// ---------------------------------------------------------------------
// RNG: xoshiro256** seeded via SplitMix64.
// ---------------------------------------------------------------------
struct Rng {
  uint64_t s[4];
};

static inline uint64_t splitmix64(uint64_t &x) {
  uint64_t z = (x += 0x9e3779b97f4a7c15ULL);
  z = (z ^ (z >> 30)) * 0xbf58476d1ce4e5b9ULL;
  z = (z ^ (z >> 27)) * 0x94d049bb133111ebULL;
  return z ^ (z >> 31);
}

static inline void rng_seed(Rng *r, uint64_t seed) {
  for (int i = 0; i < 4; i++) r->s[i] = splitmix64(seed);
}

static inline uint64_t rotl(uint64_t x, int k) {
  return (x << k) | (x >> (64 - k));
}

static inline uint64_t rng_next(Rng *r) {
  const uint64_t result = rotl(r->s[1] * 5, 7) * 9;
  const uint64_t t = r->s[1] << 17;
  r->s[2] ^= r->s[0];
  r->s[3] ^= r->s[1];
  r->s[1] ^= r->s[2];
  r->s[0] ^= r->s[3];
  r->s[2] ^= t;
  r->s[3] = rotl(r->s[3], 45);
  return result;
}

static inline int64_t rng_below(Rng *r, int64_t n) {
  // Lemire's nearly-divisionless bounded draw.
  return (int64_t)(((__uint128_t)rng_next(r) * (__uint128_t)n) >> 64);
}

// ---------------------------------------------------------------------
// sample_adj: one-hop sampled bipartite adjacency
// (reference cpu/sample_cpu.cpp:10-137).
//
// Caller sizes outputs exactly:
//   E_out = sum over idx of (deg            if num_neighbors < 0
//                            num*(deg>0)    if replace
//                            min(deg, num)  otherwise)
//   n_id buffer capacity: n_idx + E_out.
// Outputs: out_rowptr (n_idx+1), out_col/out_eid (E_out), n_id.
// Per-row cols sorted by local id. Returns the n_id count.
// ---------------------------------------------------------------------
// Per-(stream, element) RNG stream: the draws for one frontier row are
// a function of (seed, stream, element) alone, so (a) OpenMP workers
// need no shared RNG state, (b) results are identical at any thread
// count, and (c) the count-pass/fill-pass two-phase protocol samples
// identically by construction.
static inline void rng_seed_at(Rng *r, uint64_t seed, uint64_t stream,
                               uint64_t element) {
  rng_seed(&r[0], seed ^ (0x9e3779b97f4a7c15ULL * (stream + 1)) ^
                      (0xbf58476d1ce4e5b9ULL * (element + 1)));
}

// Candidate-generation pass shared by sample_adj / neighbor_sample:
// fills buf[offs[i]..offs[i+1]) with the drawn edge ids for frontier
// position i (absolute into the index arrays).  offs must hold the
// exact per-row sample sizes:
//   deg          if num < 0 or (!replace and num >= deg)
//   num          if replace and deg > 0
//   num          otherwise (Robert-Floyd without replacement)
// Row-internal order matches the serial formulation's per-branch order.
static void draw_candidates(const int64_t *ptr, const int64_t *frontier,
                            int64_t n_front, int64_t num, int32_t replace,
                            uint64_t seed, uint64_t stream,
                            const int64_t *offs, int64_t *buf) {
  const int par = n_front >= 64 && offs[n_front] >= 4096;
#pragma omp parallel for schedule(dynamic, 64) if (par)
  for (int64_t i = 0; i < n_front; i++) {
    const int64_t w = frontier[i];
    const int64_t start = ptr[w], deg = ptr[w + 1] - ptr[w];
    const int64_t ni = offs[i + 1] - offs[i];
    if (ni == 0) continue;
    int64_t *dst = buf + offs[i];
    if (num < 0 || (!replace && num >= deg)) {
      for (int64_t j = 0; j < deg; j++) dst[j] = start + j;
      continue;
    }
    Rng rng;
    rng_seed_at(&rng, seed, stream, (uint64_t)i);
    if (replace) {
      for (int64_t j = 0; j < num; j++)
        dst[j] = start + rng_below(&rng, deg);
    } else {
      // Robert Floyd sampling without replacement.
      std::unordered_set<int64_t> perm;
      perm.reserve(num * 2);
      int64_t k = 0;
      for (int64_t j = deg - num; j < deg; j++) {
        int64_t rnd = rng_below(&rng, j);
        if (!perm.insert(rnd).second) {
          rnd = j;
          perm.insert(j);
        }
        dst[k++] = start + rnd;
      }
    }
  }
}

static inline int64_t sample_size_of(int64_t deg, int64_t num,
                                     int32_t replace) {
  if (deg == 0) return 0;
  if (num < 0 || (!replace && num >= deg)) return deg;
  return num;
}

int64_t sample_adj(const int64_t *rowptr, const int64_t *col, int64_t n_nodes,
                   const int64_t *idx, int64_t n_idx, int64_t num_neighbors,
                   int32_t replace, uint64_t seed, int64_t *out_rowptr,
                   int64_t *out_col, int64_t *out_eid, int64_t *n_id) {
  (void)n_nodes;
  std::unordered_map<int64_t, int64_t> n_id_map;
  n_id_map.reserve(2 * n_idx);
  int64_t n_count = 0;
  for (int64_t i = 0; i < n_idx; i++) {
    n_id_map[idx[i]] = i;
    n_id[n_count++] = idx[i];
  }

  // Parallel candidate draw (per-seed RNG streams), then a sequential
  // relabel merge in frontier order (the hash-map growth is inherently
  // ordered; the reference parallelizes the same way in its ego
  // sampler, cpu/ego_sample_cpu.cpp:34).
  std::vector<int64_t> offs(n_idx + 1, 0);
  for (int64_t i = 0; i < n_idx; i++) {
    const int64_t deg = rowptr[idx[i] + 1] - rowptr[idx[i]];
    offs[i + 1] = offs[i] + sample_size_of(deg, num_neighbors, replace);
  }
  std::vector<int64_t> buf(offs[n_idx]);
  draw_candidates(rowptr, idx, n_idx, num_neighbors, replace, seed,
                  /*stream=*/0, offs.data(), buf.data());

  std::vector<std::pair<int64_t, int64_t>> row_buf;  // (local col, e_id)
  int64_t out_pos = 0;
  out_rowptr[0] = 0;
  for (int64_t i = 0; i < n_idx; i++) {
    row_buf.clear();
    for (int64_t t = offs[i]; t < offs[i + 1]; t++) {
      const int64_t e = buf[t];
      const int64_t c = col[e];
      auto it = n_id_map.find(c);
      int64_t local;
      if (it == n_id_map.end()) {
        local = n_count;
        n_id_map.emplace(c, local);
        n_id[n_count++] = c;
      } else {
        local = it->second;
      }
      row_buf.emplace_back(local, e);
    }
    std::sort(row_buf.begin(), row_buf.end());
    for (const auto &pr : row_buf) {
      out_col[out_pos] = pr.first;
      out_eid[out_pos] = pr.second;
      out_pos++;
    }
    out_rowptr[i + 1] = out_pos;
  }
  return n_count;
}

// ---------------------------------------------------------------------
// neighbor_sample (homogeneous, CSC-driven, reference
// cpu/neighbor_sample_cpu.cpp:16-118).
//
// Two-phase: call with out_* = nullptr to get counts packed into
// counts[0]=n_samples, counts[1]=n_edges; then call again with buffers.
// Deterministic for a fixed seed, so both phases sample identically.
// ---------------------------------------------------------------------
void neighbor_sample(const int64_t *colptr, const int64_t *row,
                     int64_t n_nodes, const int64_t *input_node,
                     int64_t n_input, const int64_t *num_neighbors,
                     int64_t num_hops, int32_t replace, int32_t directed,
                     uint64_t seed, int64_t *counts, int64_t *out_nodes,
                     int64_t *out_rows, int64_t *out_cols,
                     int64_t *out_edges) {
  (void)n_nodes;
  std::vector<int64_t> samples(input_node, input_node + n_input);
  std::unordered_map<int64_t, int64_t> to_local;
  to_local.reserve(4 * n_input);
  for (int64_t i = 0; i < n_input; i++) to_local[input_node[i]] = i;

  std::vector<int64_t> rows, cols, edges;

  auto visit = [&](int64_t e, int64_t i) {
    const int64_t v = row[e];
    auto res = to_local.emplace(v, (int64_t)samples.size());
    if (res.second) samples.push_back(v);
    if (directed) {
      rows.push_back(res.first->second);
      cols.push_back(i);
      edges.push_back(e);
    }
  };

  // Per hop: parallel candidate draw over the frontier (per-(hop, row)
  // RNG streams — thread-count invariant), then a sequential relabel
  // merge in frontier order so the to_local growth stays deterministic.
  int64_t begin = 0, end = (int64_t)samples.size();
  std::vector<int64_t> offs, buf;
  for (int64_t ell = 0; ell < num_hops; ell++) {
    const int64_t num = num_neighbors[ell];
    const int64_t n_front = end - begin;
    offs.assign(n_front + 1, 0);
    for (int64_t i = 0; i < n_front; i++) {
      const int64_t w = samples[begin + i];
      const int64_t deg = colptr[w + 1] - colptr[w];
      offs[i + 1] = offs[i] + sample_size_of(deg, num, replace);
    }
    buf.resize(offs[n_front]);
    draw_candidates(colptr, samples.data() + begin, n_front, num,
                    replace, seed, /*stream=*/(uint64_t)(ell + 1),
                    offs.data(), buf.data());
    for (int64_t i = 0; i < n_front; i++)
      for (int64_t t = offs[i]; t < offs[i + 1]; t++)
        visit(buf[t], begin + i);
    begin = end;
    end = (int64_t)samples.size();
  }

  if (!directed) {
    for (int64_t i = 0; i < (int64_t)samples.size(); i++) {
      const int64_t w = samples[i];
      for (int64_t e = colptr[w]; e < colptr[w + 1]; e++) {
        auto it = to_local.find(row[e]);
        if (it != to_local.end()) {
          rows.push_back(it->second);
          cols.push_back(i);
          edges.push_back(e);
        }
      }
    }
  }

  counts[0] = (int64_t)samples.size();
  counts[1] = (int64_t)rows.size();
  if (out_nodes) {
    std::memcpy(out_nodes, samples.data(), samples.size() * sizeof(int64_t));
    std::memcpy(out_rows, rows.data(), rows.size() * sizeof(int64_t));
    std::memcpy(out_cols, cols.data(), cols.size() * sizeof(int64_t));
    std::memcpy(out_edges, edges.data(), edges.size() * sizeof(int64_t));
  }
}

// ---------------------------------------------------------------------
// saint_subgraph: node-induced subgraph (reference cpu/saint_cpu.cpp).
// Two-phase via counts[0] = number of kept edges.
// ---------------------------------------------------------------------
void saint_subgraph(const int64_t *rowptr, const int64_t *col,
                    int64_t n_nodes, const int64_t *idx, int64_t n_idx,
                    int64_t *counts, int64_t *out_row, int64_t *out_col,
                    int64_t *out_eid) {
  std::vector<int64_t> assoc(n_nodes, -1);
  for (int64_t i = 0; i < n_idx; i++) assoc[idx[i]] = i;

  int64_t k = 0;
  for (int64_t i = 0; i < n_idx; i++) {
    const int64_t v = idx[i];
    for (int64_t e = rowptr[v]; e < rowptr[v + 1]; e++) {
      const int64_t w = assoc[col[e]];
      if (w >= 0) {
        if (out_row) {
          out_row[k] = i;
          out_col[k] = w;
          out_eid[k] = e;
        }
        k++;
      }
    }
  }
  counts[0] = k;
}

// ---------------------------------------------------------------------
// relabel_one_hop (reference cpu/relabel_cpu.cpp:45-143).
// E_out = sum(deg[idx]) (caller-computed); n_id capacity n_idx + E_out.
// Returns n_id count.
// ---------------------------------------------------------------------
int64_t relabel_one_hop(const int64_t *rowptr, const int64_t *col,
                        const int64_t *idx, int64_t n_idx,
                        int64_t *out_rowptr, int64_t *out_col,
                        int64_t *out_eid, int64_t *n_id) {
  std::unordered_map<int64_t, int64_t> n_id_map;
  n_id_map.reserve(4 * n_idx);
  int64_t n_count = 0;
  for (int64_t i = 0; i < n_idx; i++) {
    n_id_map[idx[i]] = i;
    n_id[n_count++] = idx[i];
  }
  int64_t pos = 0;
  out_rowptr[0] = 0;
  for (int64_t i = 0; i < n_idx; i++) {
    const int64_t v = idx[i];
    for (int64_t e = rowptr[v]; e < rowptr[v + 1]; e++) {
      const int64_t w = col[e];
      auto res = n_id_map.emplace(w, n_count);
      if (res.second) n_id[n_count++] = w;
      out_col[pos] = res.first->second;
      out_eid[pos] = e;
      pos++;
    }
    out_rowptr[i + 1] = pos;
  }
  return n_count;
}

// ---------------------------------------------------------------------
// random_walk: (n_starts, L+1) node ids (reference cpu/rw_cpu.cpp:5-43;
// degree-0 nodes stay in place). Host fallback of the device-native path.
// ---------------------------------------------------------------------
void random_walk(const int64_t *rowptr, const int64_t *col,
                 const int64_t *start, int64_t n_start, int64_t walk_length,
                 uint64_t seed, int64_t *out) {
  Rng rng;
  rng_seed(&rng, seed);
  for (int64_t i = 0; i < n_start; i++) {
    int64_t cur = start[i];
    out[i * (walk_length + 1)] = cur;
    for (int64_t l = 1; l <= walk_length; l++) {
      const int64_t deg = rowptr[cur + 1] - rowptr[cur];
      if (deg > 0) cur = col[rowptr[cur] + rng_below(&rng, deg)];
      out[i * (walk_length + 1) + l] = cur;
    }
  }
}

// ---------------------------------------------------------------------
// partition_refine: greedy boundary refinement (FM-style sweeps) used by
// partition/metis.py on top of the RCM chunking. Moves a node to the
// neighbor-majority part when it reduces cut and keeps balance within
// (1 + imbalance). Modifies `cluster` in place; returns #moves.
// ---------------------------------------------------------------------
int64_t partition_refine(const int64_t *rowptr, const int64_t *col,
                         int64_t n_nodes, int64_t *cluster,
                         const double *node_w, int64_t num_parts,
                         int64_t passes, double imbalance) {
  std::vector<double> part_w(num_parts, 0.0);
  double total = 0.0;
  for (int64_t v = 0; v < n_nodes; v++) {
    part_w[cluster[v]] += node_w[v];
    total += node_w[v];
  }
  const double limit = (1.0 + imbalance) * total / (double)num_parts;

  std::vector<int64_t> count(num_parts, 0);
  int64_t total_moves = 0;
  for (int64_t pass = 0; pass < passes; pass++) {
    int64_t moves = 0;
    for (int64_t v = 0; v < n_nodes; v++) {
      const int64_t p = cluster[v];
      const int64_t start = rowptr[v], end = rowptr[v + 1];
      if (end == start) continue;
      std::fill(count.begin(), count.end(), 0);
      for (int64_t e = start; e < end; e++) count[cluster[col[e]]]++;
      int64_t q = 0;
      for (int64_t t = 1; t < num_parts; t++)
        if (count[t] > count[q]) q = t;
      if (q == p || count[q] <= count[p]) continue;
      if (part_w[q] + node_w[v] > limit) continue;
      cluster[v] = q;
      part_w[p] -= node_w[v];
      part_w[q] += node_w[v];
      moves++;
    }
    total_moves += moves;
    if (moves == 0) break;
  }
  return total_moves;
}

// ---------------------------------------------------------------------
// multilevel_partition: METIS-style k-way partitioning (reference binds
// libmetis, csrc/cpu/metis_cpu.cpp:13-62; libmetis is not vendorable
// offline, so this is the same algorithmic family implemented directly):
//   1. coarsen by heavy-edge matching until the graph is small,
//   2. initial partition by weight-balanced greedy region growing,
//   3. uncoarsen, refining at every level with an edge-weighted
//      boundary sweep under a balance constraint.
// Returns the achieved edge cut (sum of cut edge weights, each
// direction counted once for symmetric inputs).
//
// Engineering notes (the hot path is memory traffic, not FLOPs):
//  * internal node ids are int32 (n < 2^31 by contract) — halves the
//    random-access miss footprint of match/cmap/cluster;
//  * the coarse graph is built with METIS-style mark/position arrays
//    (one O(E) pass, sequential writes), not per-node hash maps;
//  * level 0 never copies the input: col converts once to int32 and
//    unit edge weights stay implicit (ew empty <=> all ones);
//  * refinement sweeps only the boundary after the first pass (moves
//    enqueue their neighborhood), and per-node gains touch only the
//    parts actually adjacent (reset via a touched list);
//  * the _mt entry parallelizes the streaming phases (conversion,
//    matching via CAS claims, boundary detection, final cut) with
//    OpenMP — the analogue of the reference's mt-metis binding
//    (csrc/metis.cpp:49-69).
// ---------------------------------------------------------------------
namespace {

typedef int32_t pidx;  // internal node id; n < 2^31 by ABI contract

struct CoarseGraph {
  std::vector<int64_t> rowptr;  // (n + 1)
  std::vector<pidx> col;
  std::vector<int64_t> ew;      // empty => unit weights (level 0 unweighted)
  std::vector<double> nw;
  inline int64_t ew_at(int64_t e) const { return ew.empty() ? 1 : ew[e]; }
};

// Edge-weighted boundary refinement under a balance limit.  Pass 0
// sweeps every node; later passes sweep only nodes whose neighborhood
// changed.  With non-negative weights a node with no neighbor outside
// its own part can never move, so the boundary restriction is exact.
void refine_level(const CoarseGraph &g, std::vector<pidx> &cluster,
                  int64_t num_parts, double limit, int64_t passes,
                  bool par) {
  const int64_t n = (int64_t)g.nw.size();
  std::vector<double> part_w(num_parts, 0.0);
  for (int64_t v = 0; v < n; v++) part_w[cluster[v]] += g.nw[v];

  // gains are accumulated sparsely: `gain` stays zeroed between nodes,
  // reset through `touched`.
  std::vector<int64_t> gain(num_parts, 0);
  std::vector<pidx> touched;
  touched.reserve(num_parts);

  std::vector<uint8_t> bnd(n, 0);
  std::vector<pidx> boundary;

  // Boundary-restricted Gauss-Seidel sweeps, exactly the classic
  // full-sweep refinement restricted to nodes that can actually move:
  // with non-negative weights an interior node's best gain is its own
  // part, so skipping it is exact.  The boundary is recomputed each
  // pass (a cheap early-break scan, parallel in the mt entry); nodes
  // that become boundary mid-pass behind the sweep point are caught on
  // the next pass, so run two extra passes to absorb the lag.
  for (int64_t pass = 0; pass < passes + 2; pass++) {
    std::fill(bnd.begin(), bnd.end(), 0);
#ifdef _OPENMP
#pragma omp parallel for schedule(static) if (par)
#endif
    for (int64_t v = 0; v < n; v++) {
      const pidx p = cluster[v];
      for (int64_t e = g.rowptr[v]; e < g.rowptr[v + 1]; e++)
        if (cluster[g.col[e]] != p) {
          bnd[v] = 1;
          break;
        }
    }
    boundary.clear();
    for (int64_t v = 0; v < n; v++)
      if (bnd[v]) boundary.push_back((pidx)v);

    int64_t moves = 0;
    for (const pidx v : boundary) {
      const pidx p = cluster[v];
      const int64_t start = g.rowptr[v], end = g.rowptr[v + 1];
      if (end == start) continue;
      for (int64_t e = start; e < end; e++) {
        const pidx t = cluster[g.col[e]];
        if (gain[t] == 0) touched.push_back(t);
        gain[t] += g.ew_at(e);
      }
      pidx q = p;
      const int64_t gp = gain[p];
      for (const pidx t : touched) {
        if (t == p) continue;
        if (gain[t] > (q == p ? gp : gain[q]) ||
            (q != p && gain[t] == gain[q] && part_w[t] < part_w[q]))
          q = t;
      }
      const bool move = q != p && gain[q] > gp &&
                        part_w[q] + g.nw[v] <= limit;
      for (const pidx t : touched) gain[t] = 0;
      touched.clear();
      if (!move) continue;
      cluster[v] = q;
      part_w[p] -= g.nw[v];
      part_w[q] += g.nw[v];
      moves++;
    }
    if (getenv("SPARSE_TPU_PART_DEBUG"))
      fprintf(stderr, "[refine] n=%lld pass=%lld boundary=%zu moves=%lld\n",
              (long long)n, (long long)pass, boundary.size(),
              (long long)moves);
    if (moves == 0) break;
  }
}

// Heavy-edge matching in a shuffled visit order.  Serial version is
// deterministic for a given seed; the parallel version claims nodes
// with CAS (mt-metis-style, nondeterministic under contention).
void heavy_edge_matching(const CoarseGraph &g,
                         const std::vector<pidx> &order,
                         std::vector<pidx> &match, bool par) {
  const int64_t n = (int64_t)g.nw.size();
  match.assign(n, -1);
#ifdef _OPENMP
  if (par) {
#pragma omp parallel for schedule(dynamic, 2048)
    for (int64_t i = 0; i < n; i++) {
      const pidx v = order[i];
      pidx expected = -1;
      if (!__atomic_compare_exchange_n(&match[v], &expected, (pidx)-2,
                                       false, __ATOMIC_ACQ_REL,
                                       __ATOMIC_RELAXED))
        continue;  // claimed by a neighbor's CAS
      pidx claimed = v;  // self-match unless a neighbor is free
      int64_t best_w = -1;
      for (int64_t e = g.rowptr[v]; e < g.rowptr[v + 1]; e++) {
        const pidx u = g.col[e];
        if (u == v) continue;
        const int64_t w = g.ew_at(e);
        if (w <= best_w) continue;
        if (__atomic_load_n(&match[u], __ATOMIC_RELAXED) != -1) continue;
        pidx exp_u = -1;
        if (__atomic_compare_exchange_n(&match[u], &exp_u, v, false,
                                        __ATOMIC_ACQ_REL,
                                        __ATOMIC_RELAXED)) {
          if (claimed != v)  // release the previously claimed neighbor
            __atomic_store_n(&match[claimed], (pidx)-1, __ATOMIC_RELEASE);
          claimed = u;
          best_w = w;
        }
      }
      __atomic_store_n(&match[v], claimed, __ATOMIC_RELEASE);
    }
    // A node u1 can be claimed by v, skip its own iteration (its CAS
    // fails), and then be released back to -1 when v upgrades to a
    // heavier neighbor.  Nothing revisits it, so it would reach the
    // coarsening loop with match == -1 and drive an out-of-bounds
    // cmap[-1] write.  Self-match any such orphan after the barrier;
    // only the releasing thread ever wrote its slot, so a plain store
    // is safe here.
#pragma omp parallel for schedule(static)
    for (int64_t v = 0; v < n; v++)
      if (match[v] < 0) match[v] = (pidx)v;
    return;
  }
#else
  (void)par;
#endif
  for (const pidx v : order) {
    if (match[v] >= 0) continue;
    pidx best = -1;
    int64_t best_w = -1;
    for (int64_t e = g.rowptr[v]; e < g.rowptr[v + 1]; e++) {
      const pidx u = g.col[e];
      if (u == v || match[u] >= 0) continue;
      if (g.ew_at(e) > best_w) {
        best_w = g.ew_at(e);
        best = u;
      }
    }
    match[v] = best >= 0 ? best : v;
    if (best >= 0) match[best] = v;
  }
}

int64_t multilevel_partition_impl(const int64_t *rowptr_in,
                                  const int64_t *col_in, int64_t n_nodes,
                                  const double *node_w,
                                  const int64_t *edge_w, int64_t num_parts,
                                  uint64_t seed, double imbalance,
                                  int64_t *cluster_out, bool par) {
  Rng rng;
  rng_seed(&rng, seed ? seed : 1);

  const int64_t E0 = rowptr_in[n_nodes];
  // Level 0 references the input shape; col converts to int32 once and
  // unit edge weights stay implicit (the reference's unweighted METIS
  // call, metis_cpu.cpp:13-62).
  std::vector<CoarseGraph> levels(1);
  levels[0].rowptr.assign(rowptr_in, rowptr_in + n_nodes + 1);
  levels[0].col.resize(E0);
#ifdef _OPENMP
#pragma omp parallel for schedule(static) if (par)
#endif
  for (int64_t e = 0; e < E0; e++) levels[0].col[e] = (pidx)col_in[e];
  if (edge_w) levels[0].ew.assign(edge_w, edge_w + E0);
  levels[0].nw.resize(n_nodes);
  double total_w = 0.0;
  for (int64_t v = 0; v < n_nodes; v++) {
    levels[0].nw[v] = node_w ? node_w[v] : 1.0;
    total_w += levels[0].nw[v];
  }
  const double limit = (1.0 + imbalance) * total_w / (double)num_parts;
  // Stop coarsening around 24 nodes/part (METIS-like); below that the
  // contraction merges across community boundaries and the initial cut
  // degrades.  Small graphs (n < ~2 * target) skip coarsening entirely
  // and rely on the GGGP init + restarts below.
  const int64_t coarse_target =
      std::max<int64_t>(128, 24 * num_parts);

  std::vector<std::vector<pidx>> cmaps;  // fine node -> coarse node
  std::vector<pidx> order, match;
  while ((int64_t)levels.back().nw.size() > coarse_target) {
    const CoarseGraph &g = levels.back();
    const int64_t n = (int64_t)g.nw.size();
    // Heavy-edge matching in random visit order.
    order.resize(n);
    for (int64_t i = 0; i < n; i++) order[i] = (pidx)i;
    for (int64_t i = n - 1; i > 0; i--)
      std::swap(order[i], order[rng_below(&rng, i + 1)]);
    heavy_edge_matching(g, order, match, par);
    // Coarse ids + the 1-2 fine nodes behind each coarse node.
    std::vector<pidx> cmap(n, -1);
    std::vector<pidx> fine0, fine1;
    fine0.reserve(n / 2 + 16);
    fine1.reserve(n / 2 + 16);
    pidx nc = 0;
    for (int64_t v = 0; v < n; v++) {
      if (cmap[v] >= 0) continue;
      const pidx u = match[v];  // == v for unmatched
      cmap[v] = nc;
      cmap[u] = nc;
      fine0.push_back((pidx)v);
      fine1.push_back(u == (pidx)v ? (pidx)-1 : u);
      nc++;
    }
    if (nc >= n * 9 / 10) break;  // matching stalled
    // Build the coarse graph: one O(E) pass with mark/position arrays
    // (sequential writes into a preallocated buffer; no hashing).
    CoarseGraph cg;
    cg.nw.assign(nc, 0.0);
    for (int64_t v = 0; v < n; v++) cg.nw[cmap[v]] += g.nw[v];
    cg.rowptr.assign(nc + 1, 0);
    cg.col.resize(g.col.size());
    cg.ew.resize(g.col.size());
    std::vector<pidx> mark(nc, -1);
    std::vector<int64_t> pos(nc);
    int64_t cur = 0;
    for (pidx cv = 0; cv < nc; cv++) {
      const pidx pair[2] = {fine0[cv], fine1[cv]};
      for (const pidx f : pair) {
        if (f < 0) continue;
        for (int64_t e = g.rowptr[f]; e < g.rowptr[f + 1]; e++) {
          const pidx cu = cmap[g.col[e]];
          if (cu == cv) continue;
          if (mark[cu] != cv) {
            mark[cu] = cv;
            pos[cu] = cur;
            cg.col[cur] = cu;
            cg.ew[cur] = g.ew_at(e);
            cur++;
          } else {
            cg.ew[pos[cu]] += g.ew_at(e);
          }
        }
      }
      cg.rowptr[cv + 1] = cur;
    }
    cg.col.resize(cur);
    cg.col.shrink_to_fit();
    cg.ew.resize(cur);
    cg.ew.shrink_to_fit();
    // Shuffle each coarse row's neighbor run: matching breaks weight
    // ties by first-seen order, and discovery order (all of a pair's
    // merged neighbors consecutively) systematically biases the next
    // level's hierarchy toward locked contiguous blocks that the
    // refinement sweeps cannot unstick (measured: 13-20% final cut vs
    // 8.8% with randomized ties on a 64-community graph).  The old
    // hash-map build got this diversity for free from its iteration
    // order; keep it deliberately here.
    for (pidx cv = 0; cv < nc; cv++)
      for (int64_t e = cg.rowptr[cv + 1] - 1; e > cg.rowptr[cv]; e--) {
        const int64_t j =
            cg.rowptr[cv] + rng_below(&rng, e - cg.rowptr[cv] + 1);
        std::swap(cg.col[e], cg.col[j]);
        std::swap(cg.ew[e], cg.ew[j]);
      }
    cmaps.push_back(std::move(cmap));
    levels.push_back(std::move(cg));
  }

  // Initial partition on the coarsest graph: greedy weighted region
  // growing (GGGP) — each part repeatedly absorbs the unassigned node
  // with the heaviest edge-weight connection to it, so heavy edges stay
  // interior from the start (BFS order ignores weights and strands the
  // adjwgt contract on graphs too small to coarsen).  The coarse graph
  // is tiny, so run several randomized restarts and keep the lowest
  // weighted cut (a single unlucky seed order can trap the greedy
  // growth + refinement in a bad basin).
  {
    CoarseGraph &g = levels.back();
    const int64_t n = (int64_t)g.nw.size();
    std::vector<pidx> best_cl;
    int64_t best_cut = -1;
    // The coarsest graph is tiny (~24 nodes/part), so restarts are
    // nearly free; 12 of them squeeze out most single-seed bad basins
    // (measured: the 4-restart build still hit 2x-of-optimal cuts on
    // ~1-in-4 community-graph seeds).
    for (int restart = 0; restart < 12; restart++) {
    std::vector<pidx> cl(n, -1);
    const double target = total_w / (double)num_parts;
    int64_t assigned = 0;
    std::vector<int64_t> conn(n, 0);  // weight into the growing part
    for (int64_t p = 0; p < num_parts && assigned < n; p++) {
      double w = 0.0;
      // seed: first unassigned node (randomized start offset)
      int64_t s = rng_below(&rng, n);
      for (int64_t i = 0; i < n; i++) {
        const int64_t v = (s + i) % n;
        if (cl[v] < 0) {
          s = v;
          break;
        }
      }
      // lazy max-heap of (connection weight, node)
      std::priority_queue<std::pair<int64_t, int64_t>> heap;
      std::fill(conn.begin(), conn.end(), 0);
      auto absorb = [&](int64_t v) {
        cl[v] = (pidx)p;
        assigned++;
        w += g.nw[v];
        for (int64_t e = g.rowptr[v]; e < g.rowptr[v + 1]; e++) {
          const pidx u = g.col[e];
          if (cl[u] >= 0) continue;
          conn[u] += g.ew_at(e);
          heap.emplace(conn[u], (int64_t)u);
        }
      };
      absorb(s);
      while (w < target) {
        if (heap.empty()) {
          // Frontier exhausted (disconnected coarse graph): reseed from
          // any unassigned node so the part still reaches its target
          // weight instead of staying a stranded fragment.
          int64_t s2 = -1;
          for (int64_t v = 0; v < n; v++)
            if (cl[v] < 0) {
              s2 = v;
              break;
            }
          if (s2 < 0) break;
          absorb(s2);
          continue;
        }
        const auto [cw, v] = heap.top();
        heap.pop();
        if (cl[v] >= 0 || cw != conn[v]) continue;  // stale entry
        absorb(v);
      }
      if (p == num_parts - 1) {
        for (int64_t v = 0; v < n; v++)
          if (cl[v] < 0) {
            cl[v] = (pidx)p;
            assigned++;
          }
      }
    }
    for (int64_t v = 0; v < n; v++)
      if (cl[v] < 0) cl[v] = (pidx)(num_parts - 1);
    refine_level(g, cl, num_parts, limit, 8, par);
    int64_t wcut = 0;
    for (int64_t v = 0; v < n; v++)
      for (int64_t e = g.rowptr[v]; e < g.rowptr[v + 1]; e++)
        if (cl[v] != cl[g.col[e]]) wcut += g.ew_at(e);
    // Balance-aware restart selection: a degenerate split (stranded
    // tiny parts, one giant part) often has a LOW cut, so min-cut alone
    // must not win — infeasible attempts are penalized by their excess
    // weight before the cut breaks ties.
    std::vector<double> pw(num_parts, 0.0);
    for (int64_t v = 0; v < n; v++) pw[cl[v]] += g.nw[v];
    double maxw = 0.0;
    for (int64_t t = 0; t < num_parts; t++) maxw = std::max(maxw, pw[t]);
    const double excess = std::max(0.0, maxw - limit);
    // One unit of imbalance is worth more than any edge: scale excess
    // by the total edge weight.
    int64_t total_ew = 0;
    if (g.ew.empty())
      total_ew = (int64_t)g.col.size();
    else
      for (const int64_t w_e : g.ew) total_ew += w_e;
    const int64_t score =
        wcut + (int64_t)(excess / std::max(total_w, 1.0) *
                         (double)(total_ew + 1) * 4.0);
    if (getenv("SPARSE_TPU_PART_DEBUG"))
      fprintf(stderr, "[part] restart %d: n=%lld wcut=%lld score=%lld\n",
              restart, (long long)n, (long long)wcut, (long long)score);
    if (best_cut < 0 || score < best_cut) {
      best_cut = score;
      best_cl = cl;
    }
    }  // restarts
    // Project back through the levels.
    std::vector<pidx> cur = std::move(best_cl);
    for (int64_t li = (int64_t)cmaps.size() - 1; li >= 0; li--) {
      const std::vector<pidx> &cmap = cmaps[li];
      std::vector<pidx> fine(cmap.size());
#ifdef _OPENMP
#pragma omp parallel for schedule(static) if (par)
#endif
      for (int64_t v = 0; v < (int64_t)cmap.size(); v++)
        fine[v] = cur[cmap[v]];
      refine_level(levels[li], fine, num_parts, limit, li == 0 ? 4 : 2,
                   par);
      if (getenv("SPARSE_TPU_PART_DEBUG")) {
        const CoarseGraph &fg = levels[li];
        int64_t c = 0;
        for (int64_t v = 0; v < (int64_t)fg.nw.size(); v++)
          for (int64_t e = fg.rowptr[v]; e < fg.rowptr[v + 1]; e++)
            if (fine[v] != fine[fg.col[e]]) c += fg.ew_at(e);
        fprintf(stderr, "[part] level %lld: n=%zu wcut=%lld\n",
                (long long)li, fg.nw.size(), (long long)(c / 2));
      }
      cur = std::move(fine);
    }
    for (int64_t v = 0; v < n_nodes; v++) cluster_out[v] = cur[v];
  }

  // Edge cut on the original graph.
  int64_t cut = 0;
#ifdef _OPENMP
#pragma omp parallel for schedule(static) reduction(+ : cut) if (par)
#endif
  for (int64_t v = 0; v < n_nodes; v++)
    for (int64_t e = rowptr_in[v]; e < rowptr_in[v + 1]; e++)
      if (cluster_out[v] != cluster_out[col_in[e]]) cut++;
  return cut / 2;
}

}  // namespace

int64_t multilevel_partition_ew(const int64_t *rowptr_in,
                                const int64_t *col_in, int64_t n_nodes,
                                const double *node_w,
                                const int64_t *edge_w, int64_t num_parts,
                                uint64_t seed, double imbalance,
                                int64_t *cluster_out) {
  return multilevel_partition_impl(rowptr_in, col_in, n_nodes, node_w,
                                   edge_w, num_parts, seed, imbalance,
                                   cluster_out, /*par=*/false);
}

int64_t multilevel_partition(const int64_t *rowptr_in, const int64_t *col_in,
                             int64_t n_nodes, const double *node_w,
                             int64_t num_parts, uint64_t seed,
                             double imbalance, int64_t *cluster_out) {
  return multilevel_partition_ew(rowptr_in, col_in, n_nodes, node_w,
                                 nullptr, num_parts, seed, imbalance,
                                 cluster_out);
}

// Threaded entry (the analogue of the reference's mt-metis binding,
// csrc/metis.cpp:49-69 / csrc/cpu/metis_cpu.cpp:67-120): same pipeline
// with the streaming phases under OpenMP and CAS-claimed matching.
// num_workers <= 0 uses the OpenMP default.  Nondeterministic under
// real concurrency (matching claims race), like mt-metis.
int64_t multilevel_partition_mt(const int64_t *rowptr_in,
                                const int64_t *col_in, int64_t n_nodes,
                                const double *node_w,
                                const int64_t *edge_w, int64_t num_parts,
                                uint64_t seed, double imbalance,
                                int64_t num_workers, int64_t *cluster_out) {
#ifdef _OPENMP
  const int prev = omp_get_max_threads();
  if (num_workers > 0) omp_set_num_threads((int)num_workers);
  const int64_t cut = multilevel_partition_impl(
      rowptr_in, col_in, n_nodes, node_w, edge_w, num_parts, seed,
      imbalance, cluster_out, /*par=*/true);
  if (num_workers > 0) omp_set_num_threads(prev);
  return cut;
#else
  (void)num_workers;
  return multilevel_partition_impl(rowptr_in, col_in, n_nodes, node_w,
                                   edge_w, num_parts, seed, imbalance,
                                   cluster_out, /*par=*/false);
#endif
}

// ---------------------------------------------------------------------
// coarsen_clusters: fine-cluster extraction from the multilevel
// COARSENING hierarchy alone (the cheap layout pass behind
// partition_fine at large fine_parts).  Heavy-edge matching merges the
// tightest-connected node pairs first, so the ancestors at a coarse
// level are exactly the small communities the hybrid router's (B, B)
// densify pass wants contiguous — without the k-way initial partition
// + per-level refinement whose cost grows with k (measured 162-269 s
// at products-0.25 scale for the 1195-way fine partition; this pass is
// one O(E) matching + contraction per level).  Returns the number of
// clusters (<= ~target; more if matching stalls).  Reference
// precedent: torch_sparse/metis.py:24-75 uses the partition only as a
// layout planner — the cut does not matter here, contiguity does.
// ---------------------------------------------------------------------
int64_t coarsen_clusters(const int64_t *rowptr_in, const int64_t *col_in,
                         int64_t n_nodes, const int64_t *edge_w,
                         int64_t target_clusters, uint64_t seed,
                         int64_t *cluster_out) {
  if (target_clusters < 1) target_clusters = 1;
  Rng rng;
  rng_seed(&rng, seed ? seed : 1);

  const int64_t E0 = rowptr_in[n_nodes];
  CoarseGraph g;
  g.rowptr.assign(rowptr_in, rowptr_in + n_nodes + 1);
  g.col.resize(E0);
  for (int64_t e = 0; e < E0; e++) g.col[e] = (pidx)col_in[e];
  if (edge_w) g.ew.assign(edge_w, edge_w + E0);  // matching honors adjwgt
  g.nw.assign(n_nodes, 1.0);

  // label[v] = current coarse ancestor of input node v
  std::vector<pidx> label(n_nodes);
  for (int64_t v = 0; v < n_nodes; v++) label[v] = (pidx)v;

  std::vector<pidx> order, match;
  while ((int64_t)g.nw.size() > target_clusters) {
    const int64_t n = (int64_t)g.nw.size();
    order.resize(n);
    for (int64_t i = 0; i < n; i++) order[i] = (pidx)i;
    for (int64_t i = n - 1; i > 0; i--)
      std::swap(order[i], order[rng_below(&rng, i + 1)]);
    heavy_edge_matching(g, order, match, /*par=*/false);
    std::vector<pidx> cmap(n, -1);
    std::vector<pidx> fine0, fine1;
    fine0.reserve(n / 2 + 16);
    fine1.reserve(n / 2 + 16);
    pidx nc = 0;
    for (int64_t v = 0; v < n; v++) {
      if (cmap[v] >= 0) continue;
      const pidx u = match[v];
      cmap[v] = nc;
      cmap[u] = nc;
      fine0.push_back((pidx)v);
      fine1.push_back(u == (pidx)v ? (pidx)-1 : u);
      nc++;
    }
    if (nc >= n * 9 / 10) break;  // matching stalled
    // Stop at the level closest to the target in log space: a level
    // overshooting far past the target merges across community
    // boundaries, while stopping early only leaves slightly smaller
    // clusters.  prev-closer <=> n/target < target/nc.
    if ((int64_t)nc < target_clusters &&
        (double)n * (double)nc < (double)target_clusters *
                                     (double)target_clusters) {
      break;  // previous level was the better stop; discard this one
    }
    // contract (same mark/position build as the partitioner, unit
    // edge weights are enough for matching)
    CoarseGraph cg;
    cg.nw.assign(nc, 0.0);
    for (int64_t v = 0; v < n; v++) cg.nw[cmap[v]] += g.nw[v];
    cg.rowptr.assign(nc + 1, 0);
    cg.col.resize(g.col.size());
    cg.ew.resize(g.col.size());
    std::vector<pidx> mark(nc, -1);
    std::vector<int64_t> pos(nc);
    int64_t cur = 0;
    for (pidx cv = 0; cv < nc; cv++) {
      const pidx pair[2] = {fine0[cv], fine1[cv]};
      for (const pidx f : pair) {
        if (f < 0) continue;
        for (int64_t e = g.rowptr[f]; e < g.rowptr[f + 1]; e++) {
          const pidx cu = cmap[g.col[e]];
          if (cu == cv) continue;
          if (mark[cu] != cv) {
            mark[cu] = cv;
            pos[cu] = cur;
            cg.col[cur] = cu;
            cg.ew[cur] = g.ew_at(e);
            cur++;
          } else {
            cg.ew[pos[cu]] += g.ew_at(e);
          }
        }
      }
      cg.rowptr[cv + 1] = cur;
    }
    cg.col.resize(cur);
    cg.ew.resize(cur);
    // randomized neighbor order inside each row (see the partitioner's
    // note: discovery order biases the next matching level)
    for (pidx cv = 0; cv < nc; cv++)
      for (int64_t e = cg.rowptr[cv + 1] - 1; e > cg.rowptr[cv]; e--) {
        const int64_t j =
            cg.rowptr[cv] + rng_below(&rng, e - cg.rowptr[cv] + 1);
        std::swap(cg.col[e], cg.col[j]);
        std::swap(cg.ew[e], cg.ew[j]);
      }
    // fold this level into the running labels (no cmap stack kept:
    // labels compose forward, memory stays O(n))
    for (int64_t v = 0; v < n_nodes; v++) label[v] = cmap[label[v]];
    g = std::move(cg);
  }
  for (int64_t v = 0; v < n_nodes; v++) cluster_out[v] = label[v];
  return (int64_t)g.nw.size();
}

// ---------------------------------------------------------------------
// hgt_sample: Heterogeneous Graph Transformer layer-wise importance
// sampling (reference cpu/hgt_sample_cpu.cpp): per-type budgets of
// inverse-degree scores with a neighbor cap of 50, weighted node
// sampling proportional to budget^2 without replacement
// (Efraimidis-Spirakis keys), induced typed adjacency reconstruction.
// Flattened encoding and two-phase protocol as hetero_neighbor_sample;
// num_samples is (n_types * num_hops).
// ---------------------------------------------------------------------
namespace {

inline double rng_unit(Rng *r) {  // uniform in (0, 1)
  return ((double)(rng_next(r) >> 11) + 1.0) * 1.1102230246251564e-16;
}

}  // namespace

void hgt_sample(int64_t n_types, int64_t n_rels, int64_t num_hops,
                const int64_t *rel_src, const int64_t *rel_dst,
                const int64_t *colptr_cat, const int64_t *colptr_off,
                const int64_t *row_cat, const int64_t *row_off,
                const int64_t *inputs_cat, const int64_t *inputs_off,
                const int64_t *num_samples, uint64_t seed, int64_t *counts,
                int64_t *out_nodes_cat, int64_t *out_rows_cat,
                int64_t *out_cols_cat, int64_t *out_eids_cat) {
  const bool count_only = out_nodes_cat == nullptr;
  const int64_t MAX_NEIGHBORS = 50;  // hgt_sample_cpu.cpp:9
  Rng rng;
  rng_seed(&rng, seed);

  std::vector<std::vector<int64_t>> nodes(n_types);
  std::vector<std::unordered_map<int64_t, int64_t>> to_local(n_types);
  std::vector<std::unordered_map<int64_t, double>> budget(n_types);

  for (int64_t t = 0; t < n_types; t++) {
    for (int64_t i = inputs_off[t]; i < inputs_off[t + 1]; i++) {
      const int64_t v = inputs_cat[i];
      if (to_local[t].emplace(v, (int64_t)nodes[t].size()).second)
        nodes[t].push_back(v);
    }
  }

  auto update_budget = [&](int64_t node_type,
                           const std::vector<int64_t> &new_samples) {
    if (new_samples.empty()) return;
    for (int64_t r = 0; r < n_rels; r++) {
      if (rel_dst[r] != node_type) continue;
      const int64_t st = rel_src[r];
      const int64_t *cp = colptr_cat + colptr_off[r];
      const int64_t *rw = row_cat + row_off[r];
      for (const int64_t w : new_samples) {
        const int64_t start = cp[w], count = cp[w + 1] - cp[w];
        if (count == 0) continue;
        auto add = [&](int64_t e) {
          const int64_t v = rw[e];
          if (to_local[st].find(v) == to_local[st].end())
            budget[st][v] += 1.0 / (double)std::min(count, MAX_NEIGHBORS);
        };
        if (count > MAX_NEIGHBORS) {
          std::unordered_set<int64_t> perm;
          for (int64_t j = count - MAX_NEIGHBORS; j < count; j++) {
            int64_t rnd = rng_below(&rng, j);
            if (!perm.insert(rnd).second) {
              rnd = j;
              perm.insert(j);
            }
            add(start + rnd);
          }
        } else {
          for (int64_t j = 0; j < count; j++) add(start + j);
        }
      }
    }
  };

  for (int64_t t = 0; t < n_types; t++) update_budget(t, nodes[t]);

  std::vector<std::pair<double, int64_t>> keys;
  for (int64_t ell = 0; ell < num_hops; ell++) {
    std::vector<std::vector<int64_t>> hop_samples(n_types);
    for (int64_t t = 0; t < n_types; t++) {
      const int64_t num = num_samples[t * num_hops + ell];
      if (num <= 0 || budget[t].empty()) continue;
      // Efraimidis-Spirakis: top-num by u^(1/w), weight = budget^2.
      keys.clear();
      keys.reserve(budget[t].size());
      for (const auto &kv : budget[t]) {
        const double w = kv.second * kv.second;
        keys.emplace_back(std::pow(rng_unit(&rng), 1.0 / w), kv.first);
      }
      const int64_t take =
          std::min<int64_t>(num, (int64_t)keys.size());
      std::partial_sort(
          keys.begin(), keys.begin() + take, keys.end(),
          [](const auto &a, const auto &b) { return a.first > b.first; });
      for (int64_t i = 0; i < take; i++) {
        const int64_t v = keys[i].second;
        to_local[t][v] = (int64_t)nodes[t].size();
        nodes[t].push_back(v);
        budget[t].erase(v);
        hop_samples[t].push_back(v);
      }
    }
    if (ell < num_hops - 1)
      for (int64_t t = 0; t < n_types; t++) update_budget(t, hop_samples[t]);
  }

  // Induced typed adjacency (hgt_sample_cpu.cpp:189-230).
  std::vector<std::vector<int64_t>> rows(n_rels), cols(n_rels),
      eids(n_rels);
  for (int64_t r = 0; r < n_rels; r++) {
    const int64_t st = rel_src[r], dt = rel_dst[r];
    const int64_t *cp = colptr_cat + colptr_off[r];
    const int64_t *rw = row_cat + row_off[r];
    for (int64_t i = 0; i < (int64_t)nodes[dt].size(); i++) {
      const int64_t w = nodes[dt][i];
      for (int64_t e = cp[w]; e < cp[w + 1]; e++) {
        const auto it = to_local[st].find(rw[e]);
        if (it == to_local[st].end()) continue;
        rows[r].push_back(it->second);
        cols[r].push_back(i);
        eids[r].push_back(e);
      }
    }
  }

  for (int64_t t = 0; t < n_types; t++)
    counts[t] = (int64_t)nodes[t].size();
  for (int64_t r = 0; r < n_rels; r++)
    counts[n_types + r] = (int64_t)rows[r].size();

  if (!count_only) {
    int64_t npos = 0, epos = 0;
    for (int64_t t = 0; t < n_types; t++) {
      std::memcpy(out_nodes_cat + npos, nodes[t].data(),
                  nodes[t].size() * sizeof(int64_t));
      npos += (int64_t)nodes[t].size();
    }
    for (int64_t r = 0; r < n_rels; r++) {
      std::memcpy(out_rows_cat + epos, rows[r].data(),
                  rows[r].size() * sizeof(int64_t));
      std::memcpy(out_cols_cat + epos, cols[r].data(),
                  cols[r].size() * sizeof(int64_t));
      std::memcpy(out_eids_cat + epos, eids[r].data(),
                  eids[r].size() * sizeof(int64_t));
      epos += (int64_t)rows[r].size();
    }
  }
}

// Version tag for the loader.
// ---------------------------------------------------------------------
// ego_k_hop: per-seed k-hop BFS with a per-node neighbor cap, induced
// subgraph over the sorted visited set, block-diagonal stitching
// (reference csrc/cpu/ego_sample_cpu.cpp:16-131).
//
// Two-phase like neighbor_sample: call with out_row == nullptr to get
// counts[0] = total stitched nodes, counts[1] = total induced edges;
// then call again with buffers of those sizes.  Deterministic for a
// fixed seed, so both phases visit identically.
// ---------------------------------------------------------------------
void ego_k_hop(const int64_t *rowptr, const int64_t *col, int64_t n_nodes,
               const int64_t *seeds, int64_t n_seeds, int64_t depth,
               int64_t num_neighbors, int32_t replace, uint64_t seed,
               int64_t *counts, int64_t *out_row, int64_t *out_col,
               int64_t *out_eid, int64_t *out_nid, int64_t *out_ptr,
               int64_t *out_root) {
  (void)n_nodes;
  const bool count_only = out_row == nullptr;

  // Ego nets are independent: parallel over seeds with a per-seed RNG
  // stream (deterministic regardless of thread schedule), then a
  // sequential prefix to stitch block-diagonally.
  struct PerSeed {
    std::vector<int64_t> row, colv, eid, nid;
    int64_t root_local = 0;
  };
  std::vector<PerSeed> res(n_seeds);

#pragma omp parallel for schedule(dynamic, 8)
  for (int64_t s = 0; s < n_seeds; s++) {
    Rng rng;
    rng_seed(&rng, seed ^ (0x9e3779b97f4a7c15ULL * (uint64_t)(s + 1)));
    PerSeed &r = res[s];
    const int64_t root = seeds[s];
    std::unordered_set<int64_t> visited{root};
    std::vector<int64_t> frontier{root}, next;

    for (int64_t d = 0; d < depth && !frontier.empty(); d++) {
      next.clear();
      for (const int64_t v : frontier) {
        const int64_t start = rowptr[v], deg = rowptr[v + 1] - rowptr[v];
        auto visit = [&](int64_t e) {
          const int64_t w = col[e];
          if (visited.insert(w).second) next.push_back(w);
        };
        if (num_neighbors < 0 || (!replace && deg <= num_neighbors)) {
          for (int64_t j = 0; j < deg; j++) visit(start + j);
        } else if (replace) {
          if (deg > 0)
            for (int64_t j = 0; j < num_neighbors; j++)
              visit(start + rng_below(&rng, deg));
        } else {
          std::unordered_set<int64_t> perm;
          perm.reserve(num_neighbors * 2);
          for (int64_t j = deg - num_neighbors; j < deg; j++) {
            if (!perm.insert(rng_below(&rng, j)).second) perm.insert(j);
          }
          for (const int64_t p : perm) visit(start + p);
        }
      }
      std::sort(next.begin(), next.end());
      frontier = next;  // already unique (visited-gated)
    }

    r.nid.assign(visited.begin(), visited.end());
    std::sort(r.nid.begin(), r.nid.end());
    std::unordered_map<int64_t, int64_t> assoc;
    assoc.reserve(r.nid.size() * 2);
    for (size_t i = 0; i < r.nid.size(); i++) assoc[r.nid[i]] = (int64_t)i;
    r.root_local = assoc[root];

    for (size_t i = 0; i < r.nid.size(); i++) {
      const int64_t v = r.nid[i];
      for (int64_t e = rowptr[v]; e < rowptr[v + 1]; e++) {
        const auto it = assoc.find(col[e]);
        if (it == assoc.end()) continue;
        r.row.push_back((int64_t)i);
        r.colv.push_back(it->second);
        r.eid.push_back(e);
      }
    }
  }

  int64_t node_off = 0, edge_off = 0;
  if (!count_only) out_ptr[0] = 0;
  for (int64_t s = 0; s < n_seeds; s++) {
    const PerSeed &r = res[s];
    if (!count_only) {
      for (size_t i = 0; i < r.row.size(); i++) {
        out_row[edge_off + (int64_t)i] = node_off + r.row[i];
        out_col[edge_off + (int64_t)i] = node_off + r.colv[i];
        out_eid[edge_off + (int64_t)i] = r.eid[i];
      }
      for (size_t i = 0; i < r.nid.size(); i++)
        out_nid[node_off + (int64_t)i] = r.nid[i];
      out_root[s] = node_off + r.root_local;
      out_ptr[s + 1] = node_off + (int64_t)r.nid.size();
    }
    node_off += (int64_t)r.nid.size();
    edge_off += (int64_t)r.row.size();
  }
  counts[0] = node_off;
  counts[1] = edge_off;
}

// ---------------------------------------------------------------------
// hetero_neighbor_sample: typed-graph multi-hop sampling (reference
// cpu/neighbor_sample_cpu.cpp:132-430, non-temporal path).
//
// Flattened dict encoding: relation r has source/destination node-type
// indices rel_src[r]/rel_dst[r]; its colptr lives at
// colptr_cat[colptr_off[r] .. colptr_off[r+1]) and its row array at
// row_cat[row_off[r] .. row_off[r+1]); per-hop budgets at
// budgets[r*num_hops + hop].  Input nodes per type are concatenated via
// inputs_off (n_types+1).
//
// Two-phase: out_nodes_cat == nullptr -> counts[0..T) node counts per
// type, counts[T..T+R) edge counts per relation; then call again with
// buffers sized from those counts (concatenated in type/relation order).
// Deterministic for a fixed seed.
// ---------------------------------------------------------------------
void hetero_neighbor_sample(
    int64_t n_types, int64_t n_rels, int64_t num_hops,
    const int64_t *rel_src, const int64_t *rel_dst,
    const int64_t *colptr_cat, const int64_t *colptr_off,
    const int64_t *row_cat, const int64_t *row_off,
    const int64_t *inputs_cat, const int64_t *inputs_off,
    const int64_t *budgets, int32_t replace, int32_t directed,
    uint64_t seed, int64_t *counts, int64_t *out_nodes_cat,
    int64_t *out_rows_cat, int64_t *out_cols_cat, int64_t *out_eids_cat) {
  const bool count_only = out_nodes_cat == nullptr;
  Rng rng;
  rng_seed(&rng, seed);

  std::vector<std::vector<int64_t>> samples(n_types);
  std::vector<std::unordered_map<int64_t, int64_t>> to_local(n_types);
  for (int64_t t = 0; t < n_types; t++) {
    for (int64_t i = inputs_off[t]; i < inputs_off[t + 1]; i++) {
      const int64_t v = inputs_cat[i];
      if (to_local[t].emplace(v, (int64_t)samples[t].size()).second)
        samples[t].push_back(v);
    }
  }

  std::vector<std::vector<int64_t>> rows(n_rels), cols(n_rels),
      eids(n_rels);
  std::vector<int64_t> begin(n_types, 0), end(n_types);
  for (int64_t t = 0; t < n_types; t++) end[t] = (int64_t)samples[t].size();

  for (int64_t ell = 0; ell < num_hops; ell++) {
    for (int64_t r = 0; r < n_rels; r++) {
      const int64_t st = rel_src[r], dt = rel_dst[r];
      const int64_t budget = budgets[r * num_hops + ell];
      const int64_t *cp = colptr_cat + colptr_off[r];
      const int64_t *rw = row_cat + row_off[r];

      auto visit = [&](int64_t e, int64_t i) {
        const int64_t v = rw[e];
        auto res = to_local[st].emplace(v, (int64_t)samples[st].size());
        if (res.second) samples[st].push_back(v);
        if (directed) {
          rows[r].push_back(res.first->second);
          cols[r].push_back(i);
          eids[r].push_back(e);
        }
      };

      for (int64_t i = begin[dt]; i < end[dt]; i++) {
        const int64_t w = samples[dt][i];
        const int64_t start = cp[w], deg = cp[w + 1] - cp[w];
        if (deg == 0) continue;
        if (budget < 0 || (!replace && budget >= deg)) {
          for (int64_t j = 0; j < deg; j++) visit(start + j, i);
        } else if (replace) {
          for (int64_t j = 0; j < budget; j++)
            visit(start + rng_below(&rng, deg), i);
        } else {
          std::unordered_set<int64_t> perm;
          for (int64_t j = deg - budget; j < deg; j++) {
            int64_t rnd = rng_below(&rng, j);
            if (!perm.insert(rnd).second) {
              rnd = j;
              perm.insert(j);
            }
            visit(start + rnd, i);
          }
        }
      }
    }
    for (int64_t t = 0; t < n_types; t++) {
      begin[t] = end[t];
      end[t] = (int64_t)samples[t].size();
    }
  }

  if (!directed) {
    for (int64_t r = 0; r < n_rels; r++) {
      const int64_t st = rel_src[r], dt = rel_dst[r];
      const int64_t *cp = colptr_cat + colptr_off[r];
      const int64_t *rw = row_cat + row_off[r];
      for (int64_t i = 0; i < (int64_t)samples[dt].size(); i++) {
        const int64_t w = samples[dt][i];
        for (int64_t e = cp[w]; e < cp[w + 1]; e++) {
          const auto it = to_local[st].find(rw[e]);
          if (it != to_local[st].end()) {
            rows[r].push_back(it->second);
            cols[r].push_back(i);
            eids[r].push_back(e);
          }
        }
      }
    }
  }

  for (int64_t t = 0; t < n_types; t++)
    counts[t] = (int64_t)samples[t].size();
  for (int64_t r = 0; r < n_rels; r++)
    counts[n_types + r] = (int64_t)rows[r].size();

  if (!count_only) {
    int64_t npos = 0, epos = 0;
    for (int64_t t = 0; t < n_types; t++) {
      std::memcpy(out_nodes_cat + npos, samples[t].data(),
                  samples[t].size() * sizeof(int64_t));
      npos += (int64_t)samples[t].size();
    }
    for (int64_t r = 0; r < n_rels; r++) {
      std::memcpy(out_rows_cat + epos, rows[r].data(),
                  rows[r].size() * sizeof(int64_t));
      std::memcpy(out_cols_cat + epos, cols[r].data(),
                  cols[r].size() * sizeof(int64_t));
      std::memcpy(out_eids_cat + epos, eids[r].data(),
                  eids[r].size() * sizeof(int64_t));
      epos += (int64_t)rows[r].size();
    }
  }
}

// ---------------------------------------------------------------------
// hetero_temporal_neighbor_sample (reference
// cpu/neighbor_sample_cpu.cpp:119-130 `satisfy_time` + temporal
// branches): a sampled source must satisfy time[src] <= time[root], and
// computation trees of different roots stay disjoint — relabeling is
// keyed (node, root), so a node may appear once per seed.
//
// Same flattened encoding as hetero_neighbor_sample plus per-type node
// times: type t's times at time_cat[time_off[t] ..) when has_time[t].
// Two-phase like the others.
// ---------------------------------------------------------------------
void hetero_temporal_neighbor_sample(
    int64_t n_types, int64_t n_rels, int64_t num_hops,
    const int64_t *rel_src, const int64_t *rel_dst,
    const int64_t *colptr_cat, const int64_t *colptr_off,
    const int64_t *row_cat, const int64_t *row_off,
    const int64_t *inputs_cat, const int64_t *inputs_off,
    const int64_t *budgets, const int64_t *time_cat,
    const int64_t *time_off, const int32_t *has_time, int32_t replace,
    int32_t directed, uint64_t seed, int64_t *counts,
    int64_t *out_nodes_cat, int64_t *out_rows_cat, int64_t *out_cols_cat,
    int64_t *out_eids_cat) {
  const bool count_only = out_nodes_cat == nullptr;
  Rng rng;
  rng_seed(&rng, seed);
  const int64_t INT64_MAX_T = INT64_C(0x7fffffffffffffff);

  const int64_t n_roots = inputs_off[n_types];  // one root per input node
  std::vector<std::vector<int64_t>> samples(n_types);
  std::vector<std::vector<int64_t>> root_time(n_types), root_id(n_types);
  // (node, root) -> local id, keyed node * n_roots + root.
  std::vector<std::unordered_map<int64_t, int64_t>> to_local(n_types);

  int64_t root_counter = 0;
  for (int64_t t = 0; t < n_types; t++) {
    for (int64_t i = inputs_off[t]; i < inputs_off[t + 1]; i++) {
      const int64_t v = inputs_cat[i];
      const int64_t tm =
          has_time[t] ? time_cat[time_off[t] + v] : INT64_MAX_T;
      to_local[t][v * n_roots + root_counter] =
          (int64_t)samples[t].size();
      samples[t].push_back(v);
      root_time[t].push_back(tm);
      root_id[t].push_back(root_counter);
      root_counter++;
    }
  }

  std::vector<std::vector<int64_t>> rows(n_rels), cols(n_rels),
      eids(n_rels);
  std::vector<int64_t> begin(n_types, 0), end(n_types);
  for (int64_t t = 0; t < n_types; t++) end[t] = (int64_t)samples[t].size();

  std::vector<int64_t> ok;
  for (int64_t ell = 0; ell < num_hops; ell++) {
    for (int64_t r = 0; r < n_rels; r++) {
      const int64_t st = rel_src[r], dt = rel_dst[r];
      const int64_t budget = budgets[r * num_hops + ell];
      const int64_t *cp = colptr_cat + colptr_off[r];
      const int64_t *rw = row_cat + row_off[r];
      const int64_t *src_time =
          has_time[st] ? time_cat + time_off[st] : nullptr;

      for (int64_t i = begin[dt]; i < end[dt]; i++) {
        const int64_t w = samples[dt][i];
        const int64_t t_root = root_time[dt][i];
        const int64_t root = root_id[dt][i];
        const int64_t start = cp[w], deg = cp[w + 1] - cp[w];
        if (deg == 0) continue;
        ok.clear();
        for (int64_t j = 0; j < deg; j++) {
          if (!src_time || src_time[rw[start + j]] <= t_root)
            ok.push_back(j);
        }
        const int64_t n_ok = (int64_t)ok.size();
        if (n_ok == 0) continue;

        auto visit = [&](int64_t oj) {
          const int64_t e = start + ok[oj];
          const int64_t v = rw[e];
          auto res = to_local[st].emplace(v * n_roots + root,
                                          (int64_t)samples[st].size());
          if (res.second) {
            samples[st].push_back(v);
            root_time[st].push_back(t_root);
            root_id[st].push_back(root);
          }
          if (directed) {
            rows[r].push_back(res.first->second);
            cols[r].push_back(i);
            eids[r].push_back(e);
          }
        };

        if (budget < 0 || (!replace && budget >= n_ok)) {
          for (int64_t j = 0; j < n_ok; j++) visit(j);
        } else if (replace) {
          for (int64_t j = 0; j < budget; j++)
            visit(rng_below(&rng, n_ok));
        } else {
          std::unordered_set<int64_t> perm;
          for (int64_t j = n_ok - budget; j < n_ok; j++) {
            int64_t rnd = rng_below(&rng, j);
            if (!perm.insert(rnd).second) {
              rnd = j;
              perm.insert(j);
            }
            visit(rnd);
          }
        }
      }
    }
    for (int64_t t = 0; t < n_types; t++) {
      begin[t] = end[t];
      end[t] = (int64_t)samples[t].size();
    }
  }

  for (int64_t t = 0; t < n_types; t++)
    counts[t] = (int64_t)samples[t].size();
  for (int64_t r = 0; r < n_rels; r++)
    counts[n_types + r] = (int64_t)rows[r].size();

  if (!count_only) {
    int64_t npos = 0, epos = 0;
    for (int64_t t = 0; t < n_types; t++) {
      std::memcpy(out_nodes_cat + npos, samples[t].data(),
                  samples[t].size() * sizeof(int64_t));
      npos += (int64_t)samples[t].size();
    }
    for (int64_t r = 0; r < n_rels; r++) {
      std::memcpy(out_rows_cat + epos, rows[r].data(),
                  rows[r].size() * sizeof(int64_t));
      std::memcpy(out_cols_cat + epos, cols[r].data(),
                  cols[r].size() * sizeof(int64_t));
      std::memcpy(out_eids_cat + epos, eids[r].data(),
                  eids[r].size() * sizeof(int64_t));
      epos += (int64_t)rows[r].size();
    }
  }
}

// ---------------------------------------------------------------------
// SpGEMM (C = A @ B over CSR): Gustavson row-merge with a dense
// accumulator.  The reference does not own an SpGEMM kernel — it
// delegates to torch.sparse.mm (torch_sparse/matmul.py:97); this is the
// host-side numeric engine for large products where the device plan
// path's term materialization would not fit (see ops/spgemm.py).
//
// Two-pass protocol over an A-row range [row_lo, row_hi):
//   spgemm_nnz : writes rowptrC (row_hi-row_lo+1 entries, local, 0-based)
//                and returns nnzC for the range.
//   spgemm_fill: numeric pass writing colC (ascending per row) and valC.
// valA/valB/valC may be NULL (implicit ones / structure-only).
// Per output nnz the adds happen in ascending-k order (the A-row scan
// order), matching the device plan path's stable key-sort term order.
// OpenMP-parallel over rows with per-thread accumulators; deterministic
// regardless of thread count (each row's output depends only on inputs).
// ---------------------------------------------------------------------
}  // extern "C" — reopened below (templates cannot have C linkage)

namespace {

// Index type I: int32 when P and the row-range both fit (halves the
// mark-array cache footprint and the per-row sort traffic — the sort is
// ~half the fill-pass time on community graphs), int64 otherwise.
template <typename I>
int64_t spgemm_nnz_impl(const int64_t *rowptrA, const int64_t *colA,
                        const int64_t *rowptrB, const int64_t *colB,
                        int64_t P, int64_t row_lo, int64_t row_hi,
                        int64_t *rowptrC) {
  int64_t R = row_hi - row_lo;
  rowptrC[0] = 0;
  const int64_t W = (P + 63) / 64;
#pragma omp parallel
  {
    // Bitset mark: P/8 bytes (29 KB at Reddit scale, L1-resident) vs an
    // int32 stamp array (1 MB/thread).  Measured speed-neutral on one
    // core (the pass is instruction-bound at ~7 cycles/term; seq BW is
    // 46 GB/s so the colB stream is ~7% of the time), but the 32x
    // smaller per-thread footprint keeps many-thread hosts out of L3
    // contention.  Clearing costs O(P/64) words/row, negligible next
    // to terms/row.
    std::vector<uint64_t> bits(W, 0);
#pragma omp for schedule(dynamic, 64)
    for (int64_t r = 0; r < R; r++) {
      int64_t i = row_lo + r;
      std::fill(bits.begin(), bits.end(), 0);
      int64_t cnt = 0;
      for (int64_t e = rowptrA[i]; e < rowptrA[i + 1]; e++) {
        int64_t k = colA[e];
        for (int64_t f = rowptrB[k]; f < rowptrB[k + 1]; f++) {
          int64_t j = colB[f];
          const uint64_t m = 1ull << (j & 63);
          uint64_t &w = bits[j >> 6];
          cnt += !(w & m);
          w |= m;
        }
      }
      rowptrC[r + 1] = cnt;
    }
  }
  for (int64_t r = 0; r < R; r++) rowptrC[r + 1] += rowptrC[r];
  return rowptrC[R];
}

template <typename I>
void spgemm_fill_impl(const int64_t *rowptrA, const int64_t *colA,
                      const double *valA, const int64_t *rowptrB,
                      const int64_t *colB, const double *valB, int64_t P,
                      int64_t row_lo, int64_t row_hi,
                      const int64_t *rowptrC, int64_t *colC,
                      double *valC) {
  int64_t R = row_hi - row_lo;
#pragma omp parallel
  {
    std::vector<double> acc(valC ? P : 0, 0.0);
    std::vector<I> mark(P, (I)-1);
    std::vector<I> cols;
#pragma omp for schedule(dynamic, 64)
    for (int64_t r = 0; r < R; r++) {
      int64_t i = row_lo + r;
      I stamp = (I)r;
      // Emit in ascending column order.  Dense product rows (community
      // graphs: A^2 rows reach ~90% of P) are cheaper to emit by an
      // ordered scan of the mark array (O(P)) than by sorting collected
      // columns (O(cnt log cnt)); crossover near cnt ~ P/12.  The nnz
      // pass already fixed cnt, so choose upfront and skip collecting
      // cols entirely on dense rows (2.6x fill-pass speedup measured on
      // Reddit-10%-density A^2).
      const int64_t base = rowptrC[r];
      const int64_t cnt = rowptrC[r + 1] - base;
      const bool dense = cnt * 12 >= P;
      if (!dense) cols.clear();
      for (int64_t e = rowptrA[i]; e < rowptrA[i + 1]; e++) {
        int64_t k = colA[e];
        double va = valA ? valA[e] : 1.0;
        for (int64_t f = rowptrB[k]; f < rowptrB[k + 1]; f++) {
          int64_t j = colB[f];
          double t = valB ? va * valB[f] : va;
          if (mark[j] != stamp) {
            mark[j] = stamp;
            if (!dense) cols.push_back((I)j);
            if (valC) acc[j] = t;
          } else if (valC) {
            acc[j] += t;
          }
        }
      }
      if (dense) {
        int64_t w = base;
        for (int64_t j = 0; j < P; j++) {
          if (mark[j] == stamp) {
            colC[w] = j;
            if (valC) valC[w] = acc[j];
            w++;
          }
        }
      } else {
        std::sort(cols.begin(), cols.end());
        for (int64_t s = 0; s < cnt; s++) {
          colC[base + s] = cols[s];
          if (valC) valC[base + s] = acc[cols[s]];
        }
      }
    }
  }
}

constexpr int64_t kI32Max = 2147483647;

// ---------------------------------------------------------------------
// radix_argsort_u64: stable LSD radix argsort over uint64 keys.
//
// Host-side replacement for np.lexsort/np.argsort on the hot index
// paths (construction sort, csr2csc, hybrid build, partition cluster
// sort).  The reference accelerates the same sort with
// pyg_lib.ops.index_sort falling back to torch sort
// (torch_sparse/utils.py:14-21); here the combined (row*N+col) key is
// sorted with 11-bit-digit LSD passes over only the significant bits
// (2048 scatter regions keep the pass cache-resident: measured 1.4x
// over 16-bit digits at 20M keys and 1.8x at 60M on this host),
// OpenMP-parallel with per-thread histograms laid out bucket-major /
// thread-minor so the chunked scatter preserves stability.  Identical
// output to np.lexsort on any input (both are stable).
// ---------------------------------------------------------------------
template <int RB, typename IdxT>
void radix_argsort_rb(const uint64_t *keys, int64_t n, uint64_t key_max,
                      int64_t *perm, uint64_t *keys_out = nullptr) {
  constexpr int64_t NB = (int64_t)1 << RB;
  constexpr uint64_t MASK = (uint64_t)NB - 1;
  int bits = 0;
  while (bits < 64 && (key_max >> bits)) bits++;
  const int npasses = (bits + RB - 1) / RB;
  if (npasses == 0) {
    for (int64_t i = 0; i < n; i++) perm[i] = i;
    if (keys_out) std::memcpy(keys_out, keys, (size_t)n * sizeof(uint64_t));
    return;
  }

  int T = 1;
#ifdef _OPENMP
  T = omp_get_max_threads();
#endif
  if (T > n) T = 1;

  // Ping-pong buffers.  Keys ride along so each pass re-extracts its
  // digit from a contiguous stream; the final pass writes perm only,
  // so a 1-pass sort needs no scratch and a 2-pass sort one pair.
  std::vector<uint64_t> ka(npasses > 1 ? (size_t)n : 0),
      kb(npasses > 2 ? (size_t)n : 0);
  std::vector<IdxT> ia(npasses > 1 ? (size_t)n : 0),
      ib(npasses > 2 ? (size_t)n : 0);
  std::vector<int64_t> hist((size_t)T * NB);

  uint64_t *kbufs[2] = {ka.data(), kb.empty() ? nullptr : kb.data()};
  IdxT *ibufs[2] = {ia.data(), ib.empty() ? nullptr : ib.data()};
  const uint64_t *kin = keys;
  const IdxT *iin = nullptr;  // pass 0: identity
  int cur = 0;

  for (int p = 0; p < npasses; p++) {
    const int shift = p * RB;
    const bool last = (p == npasses - 1);
#pragma omp parallel num_threads(T)
    {
#ifdef _OPENMP
      const int t = omp_get_thread_num();
#else
      const int t = 0;
#endif
      int64_t *h = &hist[(size_t)t * NB];
      std::memset(h, 0, NB * sizeof(int64_t));
      const int64_t lo = n * t / T, hi = n * (t + 1) / T;
      for (int64_t i = lo; i < hi; i++) h[(kin[i] >> shift) & MASK]++;
    }
    // Exclusive scan, bucket-major / thread-minor: thread t's chunk of
    // bucket b lands after all smaller buckets and after earlier
    // threads' chunks of b — chunked scatter stays stable.
    int64_t sum = 0;
    bool uniform = false;
    for (int64_t b = 0; b < NB && !uniform; b++) {
      int64_t btot = 0;
      for (int t = 0; t < T; t++) btot += hist[(size_t)t * NB + b];
      if (btot == n) uniform = true;  // single digit value: skip pass
      for (int t = 0; t < T; t++) {
        int64_t c = hist[(size_t)t * NB + b];
        hist[(size_t)t * NB + b] = sum;
        sum += c;
      }
    }
    if (uniform) {
      if (last) {
        if (iin == nullptr)
          for (int64_t i = 0; i < n; i++) perm[i] = i;
        else
          for (int64_t i = 0; i < n; i++) perm[i] = (int64_t)iin[i];
        if (keys_out && keys_out != kin)
          std::memcpy(keys_out, kin, (size_t)n * sizeof(uint64_t));
        return;
      }
      continue;  // kin/iin unchanged
    }
#pragma omp parallel num_threads(T)
    {
#ifdef _OPENMP
      const int t = omp_get_thread_num();
#else
      const int t = 0;
#endif
      int64_t *h = &hist[(size_t)t * NB];
      const int64_t lo = n * t / T, hi = n * (t + 1) / T;
      if (last) {
        if (keys_out) {
          for (int64_t i = lo; i < hi; i++) {
            const int64_t pos = h[(kin[i] >> shift) & MASK]++;
            perm[pos] = iin ? (int64_t)iin[i] : i;
            keys_out[pos] = kin[i];
          }
        } else {
          for (int64_t i = lo; i < hi; i++) {
            const int64_t pos = h[(kin[i] >> shift) & MASK]++;
            perm[pos] = iin ? (int64_t)iin[i] : i;
          }
        }
      } else {
        uint64_t *kout = kbufs[cur];
        IdxT *iout = ibufs[cur];
        for (int64_t i = lo; i < hi; i++) {
          const int64_t pos = h[(kin[i] >> shift) & MASK]++;
          kout[pos] = kin[i];
          iout[pos] = iin ? iin[i] : (IdxT)i;
        }
      }
    }
    if (!last) {
      kin = kbufs[cur];
      iin = ibufs[cur];
      cur ^= 1;
    }
  }
}

// Digit width chosen per key width: 12-bit digits when they save a
// whole pass over 11-bit (e.g. the 36-bit row*N+col keys of a
// Reddit-scale graph sort in 3 passes instead of 4 — measured ~15%
// faster at 80M keys on this host); 11-bit otherwise (halved scatter
// footprint wins when the pass count ties).
inline bool use_rb12(uint64_t key_max) {
  int bits = 0;
  while (bits < 64 && (key_max >> bits)) bits++;
  return (bits + 11) / 12 < (bits + 10) / 11;
}

template <typename IdxT>
void radix_argsort_impl(const uint64_t *keys, int64_t n, uint64_t key_max,
                        int64_t *perm, uint64_t *keys_out = nullptr) {
  if (use_rb12(key_max))
    radix_argsort_rb<12, IdxT>(keys, n, key_max, perm, keys_out);
  else
    radix_argsort_rb<11, IdxT>(keys, n, key_max, perm, keys_out);
}

// ---------------------------------------------------------------------
// sort_edges: radix sort of (row*R + col) keys CARRYING the edge value
// as the scatter payload, with sorted row/col decoded from the sorted
// keys.  Versus argsort + gathers this removes (a) the perm output
// stream, (b) the random value gather val[perm] (memory-latency-bound,
// ~9 s at 160M f32 on this host), and (c) the separate key-build pass
// (keys are computed on the fly inside pass 0).  The (key, payload)
// pairs scatter as one interleaved 16-byte stream — one active cache
// line per radix bucket instead of two.
// ---------------------------------------------------------------------
template <typename P>
struct KVPair {
  uint64_t k;
  P v;
};

template <int RB, typename P>
void sort_edges_rb(const int64_t *row, const int64_t *col, const P *val,
                   int64_t n, uint64_t R, uint64_t key_max,
                   int64_t *row_out, int64_t *col_out, P *val_out) {
  using KV = KVPair<P>;
  constexpr int64_t NB = (int64_t)1 << RB;
  constexpr uint64_t MASK = (uint64_t)NB - 1;
  int bits = 0;
  while (bits < 64 && (key_max >> bits)) bits++;
  const int npasses = std::max((bits + RB - 1) / RB, 1);

  int T = 1;
#ifdef _OPENMP
  T = omp_get_max_threads();
#endif
  if (T > n) T = 1;

  std::vector<KV> ba((size_t)n), bb(npasses > 1 ? (size_t)n : 0);
  std::vector<int64_t> hist((size_t)T * NB);
  KV *bufs[2] = {ba.data(), bb.empty() ? nullptr : bb.data()};
  const KV *kin = nullptr;  // pass 0 streams row/col/val directly
  int cur = 0;

  for (int p = 0; p < npasses; p++) {
    const int shift = p * RB;
#pragma omp parallel num_threads(T)
    {
#ifdef _OPENMP
      const int t = omp_get_thread_num();
#else
      const int t = 0;
#endif
      int64_t *h = &hist[(size_t)t * NB];
      std::memset(h, 0, NB * sizeof(int64_t));
      const int64_t lo = n * t / T, hi = n * (t + 1) / T;
      if (kin == nullptr) {
        for (int64_t i = lo; i < hi; i++) {
          const uint64_t k = (uint64_t)row[i] * R + (uint64_t)col[i];
          h[(k >> shift) & MASK]++;
        }
      } else {
        for (int64_t i = lo; i < hi; i++) h[(kin[i].k >> shift) & MASK]++;
      }
    }
    int64_t sum = 0;
    bool uniform = false;
    for (int64_t b = 0; b < NB && !uniform; b++) {
      int64_t btot = 0;
      for (int t = 0; t < T; t++) btot += hist[(size_t)t * NB + b];
      if (btot == n) uniform = true;
      for (int t = 0; t < T; t++) {
        int64_t c = hist[(size_t)t * NB + b];
        hist[(size_t)t * NB + b] = sum;
        sum += c;
      }
    }
    if (uniform && kin != nullptr) continue;  // buffer already holds order
#pragma omp parallel num_threads(T)
    {
#ifdef _OPENMP
      const int t = omp_get_thread_num();
#else
      const int t = 0;
#endif
      int64_t *h = &hist[(size_t)t * NB];
      const int64_t lo = n * t / T, hi = n * (t + 1) / T;
      KV *out = bufs[cur];
      if (kin == nullptr) {
        for (int64_t i = lo; i < hi; i++) {
          const uint64_t k = (uint64_t)row[i] * R + (uint64_t)col[i];
          const int64_t pos = h[(k >> shift) & MASK]++;
          out[pos].k = k;
          out[pos].v = val ? val[i] : (P)i;
        }
      } else {
        for (int64_t i = lo; i < hi; i++) {
          const int64_t pos = h[(kin[i].k >> shift) & MASK]++;
          out[pos] = kin[i];
        }
      }
    }
    kin = bufs[cur];
    cur ^= 1;
    if (bufs[cur] == nullptr) cur ^= 1;  // single-pass: stay on ba
  }

  const KV *fin = kin;
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n; i++) {
    const uint64_t k = fin[i].k;
    const uint64_t r = k / R;
    row_out[i] = (int64_t)r;
    col_out[i] = (int64_t)(k - r * R);
    val_out[i] = fin[i].v;
  }
}

template <typename P>
void sort_edges_impl(const int64_t *row, const int64_t *col, const P *val,
                     int64_t n, uint64_t R, uint64_t key_max,
                     int64_t *row_out, int64_t *col_out, P *val_out) {
  if (use_rb12(key_max))
    sort_edges_rb<12, P>(row, col, val, n, R, key_max, row_out, col_out,
                         val_out);
  else
    sort_edges_rb<11, P>(row, col, val, n, R, key_max, row_out, col_out,
                         val_out);
}

// ---------------------------------------------------------------------
// Fused host coalesce over canonically sorted COO (the analogue of the
// reference's sort+scatter coalesce, torch_sparse/storage.py:436-466).
// numpy expresses the same dedupe as keep-mask + boolean indexing +
// flatnonzero + reduceat — five full-array passes, 40 s at 160M edges
// on this host; these kernels do one count pass + one fill pass (+ one
// reduce pass when values are f32/f64), each a single sequential sweep,
// OpenMP-chunked with boundary-aligned output offsets.
// ---------------------------------------------------------------------
template <typename I>
int64_t coalesce_count_impl(const I *row, const I *col, int64_t n) {
  if (n == 0) return 0;
  int64_t cnt = 1;
#pragma omp parallel for reduction(+ : cnt)
  for (int64_t i = 1; i < n; i++)
    cnt += (row[i] != row[i - 1]) | (col[i] != col[i - 1]);
  return cnt;
}

template <typename I>
int64_t sorted_has_dup_impl(const I *row, const I *col, int64_t n) {
  constexpr int64_t CH = 1 << 20;  // early-exit granularity
  for (int64_t s = 1; s < n; s += CH) {
    const int64_t e = std::min(n, s + CH);
    int64_t dup = 0;
    for (int64_t i = s; i < e; i++)
      dup |= (row[i] == row[i - 1]) & (col[i] == col[i - 1]);
    if (dup) return 1;
  }
  return 0;
}

template <typename I, typename S>
void coalesce_fill_impl(const I *row, const I *col, int64_t n, I *row_out,
                        I *col_out, int64_t *starts, S *seg) {
  if (n == 0) {
    starts[0] = 0;
    return;
  }
  int T = 1;
#ifdef _OPENMP
  T = omp_get_max_threads();
#endif
  if (T > n) T = 1;
  std::vector<int64_t> bcnt((size_t)T + 1, 0);
#pragma omp parallel num_threads(T)
  {
#ifdef _OPENMP
    const int t = omp_get_thread_num();
#else
    const int t = 0;
#endif
    const int64_t lo = n * t / T, hi = n * (t + 1) / T;
    int64_t c = 0;
    for (int64_t i = lo; i < hi; i++)
      c += (i == 0) || (row[i] != row[i - 1]) || (col[i] != col[i - 1]);
    bcnt[t + 1] = c;
  }
  for (int t = 0; t < T; t++) bcnt[t + 1] += bcnt[t];
#pragma omp parallel num_threads(T)
  {
#ifdef _OPENMP
    const int t = omp_get_thread_num();
#else
    const int t = 0;
#endif
    const int64_t lo = n * t / T, hi = n * (t + 1) / T;
    int64_t j = bcnt[t];
    for (int64_t i = lo; i < hi; i++) {
      if (i == 0 || row[i] != row[i - 1] || col[i] != col[i - 1]) {
        row_out[j] = row[i];
        col_out[j] = col[i];
        starts[j] = i;
        j++;
      }
      if (seg) seg[i] = (S)(j - 1);
    }
  }
  starts[bcnt[T]] = n;
}

// Per-segment value reduce over edge-sorted values (n, K) -> (m, K).
// mode: 0 sum (sequential in V, matching np.add.reduceat's left-to-right
// order), 1 mean (f64 accumulate, cast at the end — matches the host
// path's float64 reduceat-then-divide), 2 min, 3 max.
template <typename V>
void segment_reduce_val_impl(const V *val, int64_t K, const int64_t *starts,
                             int64_t m, int64_t mode, V *out) {
#pragma omp parallel for schedule(static)
  for (int64_t s = 0; s < m; s++) {
    const int64_t a = starts[s], b = starts[s + 1];
    V *o = out + s * K;
    if (mode == 1) {
      for (int64_t k = 0; k < K; k++) {
        double acc = 0.0;
        for (int64_t i = a; i < b; i++) acc += (double)val[i * K + k];
        o[k] = (V)(acc / (double)(b - a));
      }
      continue;
    }
    for (int64_t k = 0; k < K; k++) o[k] = val[a * K + k];
    if (mode == 0) {
      for (int64_t i = a + 1; i < b; i++)
        for (int64_t k = 0; k < K; k++) o[k] += val[i * K + k];
    } else if (mode == 2) {
      // NaN-propagating like np.minimum.reduceat (std::min would drop
      // a NaN update; a NaN already in o[k] survives both branches).
      for (int64_t i = a + 1; i < b; i++)
        for (int64_t k = 0; k < K; k++) {
          const V v = val[i * K + k];
          o[k] = (v < o[k] || v != v) ? v : o[k];
        }
    } else {
      for (int64_t i = a + 1; i < b; i++)
        for (int64_t k = 0; k < K; k++) {
          const V v = val[i * K + k];
          o[k] = (v > o[k] || v != v) ? v : o[k];
        }
    }
  }
}

}  // namespace

extern "C" {

int64_t spgemm_nnz(const int64_t *rowptrA, const int64_t *colA,
                   const int64_t *rowptrB, const int64_t *colB, int64_t P,
                   int64_t row_lo, int64_t row_hi, int64_t *rowptrC) {
  // Stamps are chunk-local rows (r < R), so int32 works whenever the
  // column space and the row range fit; -1 never collides with a stamp.
  if (P < kI32Max && row_hi - row_lo < kI32Max)
    return spgemm_nnz_impl<int32_t>(rowptrA, colA, rowptrB, colB, P,
                                    row_lo, row_hi, rowptrC);
  return spgemm_nnz_impl<int64_t>(rowptrA, colA, rowptrB, colB, P,
                                  row_lo, row_hi, rowptrC);
}

void spgemm_fill(const int64_t *rowptrA, const int64_t *colA,
                 const double *valA, const int64_t *rowptrB,
                 const int64_t *colB, const double *valB, int64_t P,
                 int64_t row_lo, int64_t row_hi, const int64_t *rowptrC,
                 int64_t *colC, double *valC) {
  if (P < kI32Max && row_hi - row_lo < kI32Max)
    spgemm_fill_impl<int32_t>(rowptrA, colA, valA, rowptrB, colB, valB, P,
                              row_lo, row_hi, rowptrC, colC, valC);
  else
    spgemm_fill_impl<int64_t>(rowptrA, colA, valA, rowptrB, colB, valB, P,
                              row_lo, row_hi, rowptrC, colC, valC);
}

// Fused two-key lexsort: perm = np.lexsort((lo, hi)) for non-negative
// int64 arrays with lo < lo_range.  Builds the combined key natively
// (numpy's uint64 multiply-add alone costs more than the whole radix
// sort on this host) and argsorts it stably.
void lexsort_i64_pair(const int64_t *hi, const int64_t *lo, int64_t n,
                      int64_t lo_range, int64_t *perm) {
  if (n <= 0) return;
  std::vector<uint64_t> keys((size_t)n);
  uint64_t kmax = 0;
#pragma omp parallel for reduction(max : kmax)
  for (int64_t i = 0; i < n; i++) {
    const uint64_t k =
        (uint64_t)hi[i] * (uint64_t)lo_range + (uint64_t)lo[i];
    keys[i] = k;
    kmax = std::max(kmax, k);
  }
  if (n < (1 << 15)) {
    for (int64_t i = 0; i < n; i++) perm[i] = i;
    const uint64_t *kp = keys.data();
    std::stable_sort(perm, perm + n, [kp](int64_t a, int64_t b) {
      return kp[a] < kp[b];
    });
    return;
  }
  if (n <= kI32Max)
    radix_argsort_impl<uint32_t>(keys.data(), n, kmax, perm);
  else
    radix_argsort_impl<int64_t>(keys.data(), n, kmax, perm);
}

void radix_argsort_u64(const uint64_t *keys, int64_t n, int64_t *perm) {
  if (n <= 0) return;
  if (n < (1 << 15)) {
    // Histogram setup dominates below ~32K elements; a comparison sort
    // on (key, original index) pairs is faster and equally stable.
    for (int64_t i = 0; i < n; i++) perm[i] = i;
    std::stable_sort(perm, perm + n, [keys](int64_t a, int64_t b) {
      return keys[a] < keys[b];
    });
    return;
  }
  uint64_t kmax = 0;
#pragma omp parallel for reduction(max : kmax)
  for (int64_t i = 0; i < n; i++) kmax = std::max(kmax, keys[i]);
  if (n <= kI32Max)
    radix_argsort_impl<uint32_t>(keys, n, kmax, perm);
  else
    radix_argsort_impl<int64_t>(keys, n, kmax, perm);
}

// lexsort_i64_pair + decode: the construction sort's output row/col are
// recovered from the SORTED keys (hi = key / lo_range, lo = key % lo_range)
// instead of gathering hi[perm]/lo[perm] — the random gathers are
// memory-latency-bound (~16 s each at 160M edges on this host); the
// decode is one sequential sweep (~1.5 s).  perm is still produced for
// the value permutation.
void lexsort_i64_pair_decode(const int64_t *hi, const int64_t *lo, int64_t n,
                             int64_t lo_range, int64_t *perm,
                             int64_t *hi_out, int64_t *lo_out) {
  if (n <= 0) return;
  std::vector<uint64_t> keys((size_t)n);
  uint64_t kmax = 0;
#pragma omp parallel for reduction(max : kmax)
  for (int64_t i = 0; i < n; i++) {
    const uint64_t k =
        (uint64_t)hi[i] * (uint64_t)lo_range + (uint64_t)lo[i];
    keys[i] = k;
    kmax = std::max(kmax, k);
  }
  if (n < (1 << 15)) {
    for (int64_t i = 0; i < n; i++) perm[i] = i;
    const uint64_t *kp = keys.data();
    std::stable_sort(perm, perm + n, [kp](int64_t a, int64_t b) {
      return kp[a] < kp[b];
    });
    for (int64_t i = 0; i < n; i++) {
      const uint64_t k = keys[(size_t)perm[i]];
      hi_out[i] = (int64_t)(k / (uint64_t)lo_range);
      lo_out[i] = (int64_t)(k % (uint64_t)lo_range);
    }
    return;
  }
  std::vector<uint64_t> keys_sorted((size_t)n);
  if (n <= kI32Max)
    radix_argsort_impl<uint32_t>(keys.data(), n, kmax, perm,
                                 keys_sorted.data());
  else
    radix_argsort_impl<int64_t>(keys.data(), n, kmax, perm,
                                keys_sorted.data());
  keys.clear();
  keys.shrink_to_fit();
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n; i++) {
    const uint64_t k = keys_sorted[(size_t)i];
    const uint64_t h = k / (uint64_t)lo_range;
    hi_out[i] = (int64_t)h;
    lo_out[i] = (int64_t)(k - h * (uint64_t)lo_range);
  }
}

// sort_edges: canonical (row, col) sort carrying the value as radix
// payload; row/col decoded from the sorted keys, no perm produced.
// key_max = (uint64)M * col_range - 1 must fit uint64 (caller checks).
void sort_edges_f32(const int64_t *row, const int64_t *col, const float *val,
                    int64_t n, int64_t M, int64_t col_range,
                    int64_t *row_out, int64_t *col_out, float *val_out) {
  if (n <= 0) return;
  sort_edges_impl<float>(row, col, val, n, (uint64_t)col_range,
                         (uint64_t)M * (uint64_t)col_range - 1, row_out,
                         col_out, val_out);
}

void sort_edges_f64(const int64_t *row, const int64_t *col,
                    const double *val, int64_t n, int64_t M,
                    int64_t col_range, int64_t *row_out, int64_t *col_out,
                    double *val_out) {
  if (n <= 0) return;
  sort_edges_impl<double>(row, col, val, n, (uint64_t)col_range,
                          (uint64_t)M * (uint64_t)col_range - 1, row_out,
                          col_out, val_out);
}

// Payload = original edge index (argsort form of sort_edges, for value
// dtypes the f32/f64 entries don't cover).
void sort_edges_perm(const int64_t *row, const int64_t *col, int64_t n,
                     int64_t M, int64_t col_range, int64_t *row_out,
                     int64_t *col_out, int64_t *perm_out) {
  if (n <= 0) return;
  sort_edges_impl<int64_t>(row, col, nullptr, n, (uint64_t)col_range,
                           (uint64_t)M * (uint64_t)col_range - 1, row_out,
                           col_out, perm_out);
}

// Coalesce family over canonically sorted COO.  idx_dtype: 0 = int64,
// 1 = int32 (row/col/row_out/col_out/seg all share it).
int64_t coalesce_count(const void *row, const void *col, int64_t n,
                       int64_t idx_dtype) {
  return idx_dtype == 0
             ? coalesce_count_impl((const int64_t *)row, (const int64_t *)col,
                                   n)
             : coalesce_count_impl((const int32_t *)row, (const int32_t *)col,
                                   n);
}

int64_t sorted_has_dup(const void *row, const void *col, int64_t n,
                       int64_t idx_dtype) {
  return idx_dtype == 0
             ? sorted_has_dup_impl((const int64_t *)row, (const int64_t *)col,
                                   n)
             : sorted_has_dup_impl((const int32_t *)row, (const int32_t *)col,
                                   n);
}

// seg_dtype: 0 = int64, 1 = int32 (independent of idx_dtype so a
// 64-bit-indexed graph under 2^31 edges can still take the 4-byte
// segment map).
void coalesce_fill(const void *row, const void *col, int64_t n,
                   int64_t idx_dtype, void *row_out, void *col_out,
                   int64_t *starts, void *seg, int64_t seg_dtype) {
  if (idx_dtype == 0) {
    if (seg_dtype == 0)
      coalesce_fill_impl((const int64_t *)row, (const int64_t *)col, n,
                         (int64_t *)row_out, (int64_t *)col_out, starts,
                         (int64_t *)seg);
    else
      coalesce_fill_impl((const int64_t *)row, (const int64_t *)col, n,
                         (int64_t *)row_out, (int64_t *)col_out, starts,
                         (int32_t *)seg);
  } else {
    if (seg_dtype == 0)
      coalesce_fill_impl((const int32_t *)row, (const int32_t *)col, n,
                         (int32_t *)row_out, (int32_t *)col_out, starts,
                         (int64_t *)seg);
    else
      coalesce_fill_impl((const int32_t *)row, (const int32_t *)col, n,
                         (int32_t *)row_out, (int32_t *)col_out, starts,
                         (int32_t *)seg);
  }
}

// val_dtype: 1 = float32, 2 = float64.  mode: 0 sum, 1 mean, 2 min, 3 max.
void segment_reduce_val(const void *val, int64_t K, int64_t val_dtype,
                        const int64_t *starts, int64_t m, int64_t mode,
                        void *val_out) {
  if (val_dtype == 1)
    segment_reduce_val_impl((const float *)val, K, starts, m, mode,
                            (float *)val_out);
  else
    segment_reduce_val_impl((const double *)val, K, starts, m, mode,
                            (double *)val_out);
}

int64_t sparse_tpu_native_abi_version() { return 6; }

}  // extern "C"
