// Public C ABI of libsparse_tpu_native — the host-side sampling /
// partitioning kernels of pytorch_sparse_tpu (the analogue of the
// reference's C++ consumer API, csrc/sparse.h:1-76 + CMake package).
//
// Conventions:
//  * All index arrays are int64, caller-allocated.
//  * Functions with data-dependent output sizes use a two-phase
//    protocol: call once with the output pointers NULL to receive
//    counts, allocate, call again (deterministic for a fixed seed).
//  * Random draws use xoshiro256** seeded per call: same seed =>
//    identical output.

#pragma once

#include <stdint.h>

#ifdef __cplusplus
extern "C" {
#endif

// ABI version; must match pytorch_sparse_tpu.csrc.ABI_VERSION.
int64_t sparse_tpu_native_abi_version(void);

// One-hop sampled bipartite adjacency (GraphSAGE loader primitive).
// Caller sizes outputs exactly; returns the n_id count.
int64_t sample_adj(const int64_t *rowptr, const int64_t *col,
                   int64_t n_nodes, const int64_t *idx, int64_t n_idx,
                   int64_t num_neighbors, int32_t replace, uint64_t seed,
                   int64_t *out_rowptr, int64_t *out_col,
                   int64_t *out_eid, int64_t *n_id);

// Multi-hop CSC-driven neighbor sampling (homogeneous). Two-phase:
// counts[0]=n_samples, counts[1]=n_edges.
void neighbor_sample(const int64_t *colptr, const int64_t *row,
                     int64_t n_nodes, const int64_t *input_node,
                     int64_t n_input, const int64_t *num_neighbors,
                     int64_t num_hops, int32_t replace, int32_t directed,
                     uint64_t seed, int64_t *counts, int64_t *out_nodes,
                     int64_t *out_rows, int64_t *out_cols,
                     int64_t *out_edges);

// Typed-graph multi-hop sampling over a flattened relation encoding.
// Two-phase: counts[0..T) node counts, counts[T..T+R) edge counts.
void hetero_neighbor_sample(
    int64_t n_types, int64_t n_rels, int64_t num_hops,
    const int64_t *rel_src, const int64_t *rel_dst,
    const int64_t *colptr_cat, const int64_t *colptr_off,
    const int64_t *row_cat, const int64_t *row_off,
    const int64_t *inputs_cat, const int64_t *inputs_off,
    const int64_t *budgets, int32_t replace, int32_t directed,
    uint64_t seed, int64_t *counts, int64_t *out_nodes_cat,
    int64_t *out_rows_cat, int64_t *out_cols_cat, int64_t *out_eids_cat);

// Temporal variant: per-type node times, time[src] <= time[root],
// (node, root)-keyed disjoint computation trees.
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
    int64_t *out_eids_cat);

// Per-seed k-hop ego nets, block-diagonally stitched. Two-phase:
// counts[0]=total nodes, counts[1]=total edges.
void ego_k_hop(const int64_t *rowptr, const int64_t *col, int64_t n_nodes,
               const int64_t *seeds, int64_t n_seeds, int64_t depth,
               int64_t num_neighbors, int32_t replace, uint64_t seed,
               int64_t *counts, int64_t *out_row, int64_t *out_col,
               int64_t *out_eid, int64_t *out_nid, int64_t *out_ptr,
               int64_t *out_root);

// Node-induced subgraph. Two-phase: counts[0] = kept edges.
void saint_subgraph(const int64_t *rowptr, const int64_t *col,
                    int64_t n_nodes, const int64_t *idx, int64_t n_idx,
                    int64_t *counts, int64_t *out_row, int64_t *out_col,
                    int64_t *out_eid);

// Full 1-hop relabel of a frontier. Returns the n_id count.
int64_t relabel_one_hop(const int64_t *rowptr, const int64_t *col,
                        const int64_t *idx, int64_t n_idx,
                        int64_t *out_rowptr, int64_t *out_col,
                        int64_t *out_eid, int64_t *n_id);

// Uniform random walks; out is (n_starts, walk_length + 1).
void random_walk(const int64_t *rowptr, const int64_t *col,
                 const int64_t *start, int64_t n_start,
                 int64_t walk_length, uint64_t seed, int64_t *out);

// Greedy + refinement k-way graph partition (METIS-shaped output:
// cluster id per node). Returns the achieved edge cut.
int64_t partition_refine(const int64_t *rowptr, const int64_t *col,
                         int64_t n_nodes, int64_t *cluster,
                         const double *node_weight, int64_t n_parts,
                         int64_t n_iters, double imbalance);

// METIS-style multilevel k-way partition (heavy-edge matching coarsening
// + refinement per level). Returns the achieved edge cut.
int64_t multilevel_partition(const int64_t *rowptr_in, const int64_t *col_in,
                             int64_t n_nodes, const double *node_weight,
                             int64_t n_parts, uint64_t seed,
                             double imbalance, int64_t *cluster);

// Edge-weighted variant: edge_w (nnz int64, NULL = unit weights) seeds
// the heavy-edge matching and the refinement gains — the analogue of
// the reference's METIS adjwgt (metis_cpu.cpp:13-62, weighted=True).
int64_t multilevel_partition_ew(const int64_t *rowptr_in,
                                const int64_t *col_in, int64_t n_nodes,
                                const double *node_weight,
                                const int64_t *edge_w, int64_t n_parts,
                                uint64_t seed, double imbalance,
                                int64_t *cluster);

// Threaded entry (the analogue of the reference's mt-metis binding,
// csrc/metis.cpp:49-69): same pipeline with the streaming phases under
// OpenMP and CAS-claimed matching.  num_workers <= 0 uses the OpenMP
// default.  Nondeterministic under real concurrency, like mt-metis.
int64_t multilevel_partition_mt(const int64_t *rowptr_in,
                                const int64_t *col_in, int64_t n_nodes,
                                const double *node_weight,
                                const int64_t *edge_w, int64_t n_parts,
                                uint64_t seed, double imbalance,
                                int64_t num_workers, int64_t *cluster);

// HGT layer-wise importance sampling over the flattened relation
// encoding (see hetero_neighbor_sample for the layout).
void hgt_sample(int64_t n_types, int64_t n_rels, int64_t num_hops,
                const int64_t *rel_src, const int64_t *rel_dst,
                const int64_t *colptr_cat, const int64_t *colptr_off,
                const int64_t *row_cat, const int64_t *row_off,
                const int64_t *inputs_cat, const int64_t *inputs_off,
                const int64_t *num_samples, uint64_t seed, int64_t *counts,
                int64_t *out_nodes_cat, int64_t *out_rows_cat,
                int64_t *out_cols_cat, int64_t *out_eids_cat);

// SpGEMM C = A @ B (CSR, Gustavson dense-accumulator row merge) over the
// A-row range [row_lo, row_hi). Two-pass: spgemm_nnz fills the local
// rowptrC (row_hi-row_lo+1 entries) and returns nnzC; spgemm_fill writes
// colC (ascending per row) and valC. valA/valB/valC may be NULL
// (implicit-ones values / structure-only).
// Stable LSD radix argsort of non-negative uint64 keys (perm such that
// keys[perm] is ascending, ties in original order).
void radix_argsort_u64(const uint64_t *keys, int64_t n, int64_t *perm);

// perm = np.lexsort((lo, hi)) for non-negative int64 arrays with
// lo < lo_range (stable order by hi, ties by lo).
void lexsort_i64_pair(const int64_t *hi, const int64_t *lo, int64_t n,
                      int64_t lo_range, int64_t *perm);

// lexsort_i64_pair + sorted outputs decoded from the sorted combined
// keys (hi_out[i] = hi[perm[i]], lo_out[i] = lo[perm[i]] without the
// random gathers).
void lexsort_i64_pair_decode(const int64_t *hi, const int64_t *lo, int64_t n,
                             int64_t lo_range, int64_t *perm,
                             int64_t *hi_out, int64_t *lo_out);

// Canonical (row, col) edge sort carrying the value as the radix
// payload: writes row/col in sorted order (decoded from the sorted
// combined keys) and the value permuted alongside; no perm produced.
// Requires 0 <= row < M, 0 <= col < col_range, and M * col_range - 1
// to fit uint64.  sort_edges_perm instead carries the original edge
// index (for value dtypes the f32/f64 entries don't cover).
void sort_edges_f32(const int64_t *row, const int64_t *col, const float *val,
                    int64_t n, int64_t M, int64_t col_range,
                    int64_t *row_out, int64_t *col_out, float *val_out);
void sort_edges_f64(const int64_t *row, const int64_t *col,
                    const double *val, int64_t n, int64_t M,
                    int64_t col_range, int64_t *row_out, int64_t *col_out,
                    double *val_out);
void sort_edges_perm(const int64_t *row, const int64_t *col, int64_t n,
                     int64_t M, int64_t col_range, int64_t *row_out,
                     int64_t *col_out, int64_t *perm_out);

// Coalesce family over canonically (row, col)-sorted COO.
// idx_dtype: 0 = int64, 1 = int32 (applies to row/col/row_out/col_out/seg).
int64_t sorted_has_dup(const void *row, const void *col, int64_t n,
                       int64_t idx_dtype);
int64_t coalesce_count(const void *row, const void *col, int64_t n,
                       int64_t idx_dtype);
// row_out/col_out: length coalesce_count(...); starts: that length + 1
// (starts[m] = n); seg (optional, may be NULL): per-input-edge output
// segment id, length n, with its own dtype code (0 = int64, 1 = int32).
void coalesce_fill(const void *row, const void *col, int64_t n,
                   int64_t idx_dtype, void *row_out, void *col_out,
                   int64_t *starts, void *seg, int64_t seg_dtype);
// Per-segment reduce of edge-sorted values (n, K) -> (m, K).
// val_dtype: 1 = float32, 2 = float64; mode: 0 sum, 1 mean (f64
// accumulation), 2 min, 3 max.
void segment_reduce_val(const void *val, int64_t K, int64_t val_dtype,
                        const int64_t *starts, int64_t m, int64_t mode,
                        void *val_out);

int64_t spgemm_nnz(const int64_t *rowptrA, const int64_t *colA,
                   const int64_t *rowptrB, const int64_t *colB, int64_t P,
                   int64_t row_lo, int64_t row_hi, int64_t *rowptrC);
void spgemm_fill(const int64_t *rowptrA, const int64_t *colA,
                 const double *valA, const int64_t *rowptrB,
                 const int64_t *colB, const double *valB, int64_t P,
                 int64_t row_lo, int64_t row_hi, const int64_t *rowptrC,
                 int64_t *colC, double *valC);

#ifdef __cplusplus
}  // extern "C"
#endif
