"""Hierarchical (DCN x ICI) distributed SpMM.

Multi-slice TPU pods have two interconnect tiers: chips within a slice
talk over ICI (fast), slices talk over DCN (an order of magnitude less
bandwidth).  The flat 1-D halo schedule (``dist.py``) issues ONE
all_to_all across all row shards, which (a) routes most of its traffic
over DCN as soon as there is more than one slice and (b) sends the same
remote row once PER REQUESTING CHIP.  This module adds the
hierarchy-aware schedule the reference has no analogue for (the
reference has no distributed runtime at all, SURVEY.md §2.3):

* rows are partitioned over a 2-D ``(dcn, ici)`` mesh — slice ``s`` owns
  the contiguous row blocks ``[s*C, (s+1)*C)``;
* intra-slice halos ride one all_to_all over the ICI axis only;
* cross-slice halos are DEDUPLICATED AT THE SLICE LEVEL: each server
  block sends the union of the rows that ANY chip of a client slice
  references — once per slice over DCN (one all_to_all over the ``dcn``
  axis), then the union is spread to the slice's chips over ICI (one
  all_gather).  DCN bytes drop by the intra-slice sharing factor, which
  is large on METIS-ordered community graphs where neighboring blocks
  reference the same hub rows.

Use :func:`make_mesh_hier` for the mesh, permute with ``partition()``
first so cluster boundaries align with slice boundaries, and compare
fabrics with :meth:`HierShardedSparseMatrix.wire_report`.
"""

from __future__ import annotations

from functools import partial
from typing import List

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..tensor import SparseTensor
from .dist import (
    _build_group_ell,
    _cdiv,
    _combine_minmax,
    _extract_coo,
    _group_ell_apply,
    _group_ell_minmax,
    _is_min_of,
    _postprocess,
)
from .mesh import _take_devices, data_axis

dcn_axis = "d"


def make_mesh_hier(
    n_slices: int,
    n_chips: int,
    dcn_name: str = dcn_axis,
    ici_name: str = data_axis,
    devices=None,
) -> Mesh:
    """``(n_slices, n_chips)`` mesh: axis 0 crosses slices (DCN), axis 1
    stays inside a slice (ICI).  On real pods pass ``devices`` ordered
    slice-major (row ``s`` of the device array = the chips of slice
    ``s``) — ``jax.devices()`` default order is NOT guaranteed to group
    by slice."""
    if devices is None:
        devices = _take_devices(n_slices * n_chips)
    devices = np.asarray(devices).reshape(n_slices, n_chips)
    return Mesh(devices, (dcn_name, ici_name))


class HierShardedSparseMatrix:
    """Row-partitioned sparse matrix on a ``(dcn, ici)`` mesh.

    Same shared-shape ELLPACK table machinery as
    :class:`~pytorch_sparse_tpu.parallel.dist.ShardedSparseMatrix`, with
    the edge set split three ways per shard:

      interior        — columns in the shard's own block (no traffic)
      intra frontier  — columns elsewhere in the OWN slice (ICI)
      cross frontier  — columns in other slices (DCN, slice-deduped)
    """

    def __init__(self, mesh: Mesh, M: int, N: int, Mb: int, Nb: int,
                 S: int, C: int,
                 int_itabs, int_vtabs, int_etabs, int_inv,
                 fi_itabs, fi_vtabs, fi_etabs, fi_inv, serve_ici,
                 fx_itabs, fx_vtabs, fx_etabs, fx_inv, serve_dcn,
                 Hi: int, Hx: int, rowcount=None, nnz: int = 0,
                 wire_stats=None,
                 int_blocks=None, int_srow=None, int_scol=None,
                 rest_itabs=(), rest_vtabs=(), rest_inv=None,
                 block_B: int = 512, fi_dense=None, fx_dense=None):
        self.mesh = mesh
        self.M, self.N = M, N
        self.Mb, self.Nb = Mb, Nb
        self.S, self.C = S, C
        self.P = S * C
        self.int_itabs = tuple(int_itabs)
        self.int_vtabs = tuple(int_vtabs)
        self.int_etabs = tuple(int_etabs)
        self.int_inv = int_inv
        self.fi_itabs = tuple(fi_itabs)
        self.fi_vtabs = tuple(fi_vtabs)
        self.fi_etabs = tuple(fi_etabs)
        self.fi_inv = fi_inv
        self.serve_ici = serve_ici
        self.fx_itabs = tuple(fx_itabs)
        self.fx_vtabs = tuple(fx_vtabs)
        self.fx_etabs = tuple(fx_etabs)
        self.fx_inv = fx_inv
        self.serve_dcn = serve_dcn
        self.Hi, self.Hx = Hi, Hx
        self.rowcount = rowcount
        self.nnz = nnz
        # static ints: real (unpadded) halo row counts for fabric
        # accounting — not pytree leaves.
        self.wire_stats = wire_stats or {}
        # Hybrid local format (interior dense blocks; parallel/dist.py)
        self.int_blocks = int_blocks
        self.int_srow = int_srow
        self.int_scol = int_scol
        self.rest_itabs = tuple(rest_itabs)
        self.rest_vtabs = tuple(rest_vtabs)
        self.rest_inv = rest_inv
        self.block_B = block_B
        # Dense frontier stores per tier (values baked): intra-slice
        # (G, Mb, C*Hi) against the ICI halo buffer, cross-slice
        # (G, Mb, C*S*Hx) against the DCN union buffer.
        self.fi_dense = fi_dense
        self.fx_dense = fx_dense

    def has_interior_blocks(self) -> bool:
        return self.int_blocks is not None

    # ------------------------------------------------------------------
    @classmethod
    def from_sparse_tensor(
        cls, A: SparseTensor, mesh: Mesh,
        interior_blocks: str = "auto", block_B: int = 512,
        frontier_dense: str = "auto",
    ) -> "HierShardedSparseMatrix":
        """Partition ``A``'s rows into ``S*C`` contiguous blocks; slice
        ``s`` owns blocks ``[s*C, (s+1)*C)``.  METIS-permute first
        (``partition(S*C)``) so both tiers see community-aligned cuts."""
        S = mesh.shape[dcn_axis]
        C = mesh.shape[data_axis]
        Pn = S * C
        M, N = A.sparse_sizes()
        Mb, Nb = _cdiv(M, Pn), _cdiv(N, Pn)

        row, col, value_np, eid, E = _extract_coo(A)
        owner = row // Mb
        block = col // Nb
        blk_slice = block // C

        int_groups, fi_groups, fx_groups = [], [], []
        # ici_cols[q][c'] = distinct q-local cols client chip (s, c')
        # needs from server block q (same slice).
        ici_cols: List[List[np.ndarray]] = [
            [np.zeros(0, np.int64)] * C for _ in range(Pn)
        ]
        # dcn_cols[q][s'] = union of q-local cols ANY chip of client
        # slice s' needs from server block q (other slice).
        dcn_cols: List[List[np.ndarray]] = [
            [np.zeros(0, np.int64)] * S for _ in range(Pn)
        ]
        flat_cross_rows = 0  # per-(chip, block) counts (no slice dedup)
        fi_raw, fx_raw = [], []
        for p in range(Pn):
            s, c = divmod(p, C)
            selp = owner == p
            interior = selp & (block == p)
            int_groups.append((
                row[interior] - p * Mb, col[interior] - p * Nb,
                value_np[interior], eid[interior],
            ))
            fi = selp & (blk_slice == s) & (block != p)
            fx = selp & (blk_slice != s)
            # intra-slice: record the distinct cols per server chip
            rf, cf, qf = row[fi] - p * Mb, col[fi], block[fi]
            for cq in range(C):
                q = s * C + cq
                sq = qf == q
                if q == p or not sq.any():
                    continue
                ici_cols[q][c] = np.unique(cf[sq] - q * Nb)
            fi_raw.append((rf, cf, qf, value_np[fi], eid[fi]))
            # cross-slice: accumulate per-(server block, client slice)
            rx, cx, qx = row[fx] - p * Mb, col[fx], block[fx]
            for q in np.unique(qx):
                sq = qx == q
                u = np.unique(cx[sq] - q * Nb)
                flat_cross_rows += u.size
                prev = dcn_cols[q][s]
                dcn_cols[q][s] = (
                    np.union1d(prev, u) if prev.size else u
                )
            fx_raw.append((rx, cx, qx, value_np[fx], eid[fx]))

        Hi = max([1] + [u.size for per in ici_cols for u in per])
        Hx = max([1] + [u.size for per in dcn_cols for u in per])
        serve_ici = np.zeros((Pn, C, Hi), np.int32)
        serve_dcn = np.zeros((Pn, S, Hx), np.int32)
        for q in range(Pn):
            for cc in range(C):
                u = ici_cols[q][cc]
                serve_ici[q, cc, : u.size] = u
            for ss in range(S):
                u = dcn_cols[q][ss]
                serve_dcn[q, ss, : u.size] = u

        # client-side buffer indices
        for p in range(Pn):
            s, c = divmod(p, C)
            rf, cf, qf, vf, ef = fi_raw[p]
            buf = np.zeros(rf.shape[0], np.int64)
            for cq in range(C):
                q = s * C + cq
                sq = qf == q
                if not sq.any():
                    continue
                u = ici_cols[q][c]
                buf[sq] = cq * Hi + np.searchsorted(u, cf[sq] - q * Nb)
            fi_groups.append((rf, buf, vf, ef))

            rx, cx, qx, vx, ex = fx_raw[p]
            bufx = np.zeros(rx.shape[0], np.int64)
            for q in np.unique(qx):
                sq = qx == q
                u = dcn_cols[q][s]
                sqq, cq = divmod(int(q), C)
                bufx[sq] = (
                    (cq * S + sqq) * Hx
                    + np.searchsorted(u, cx[sq] - q * Nb)
                )
            fx_groups.append((rx, bufx, vx, ex))

        int_itabs, int_vtabs, int_etabs, int_inv, _ = _build_group_ell(
            int_groups, Mb, sentinel=Nb, E_total=E
        )
        int_blocks = int_srow = int_scol = rest_inv = None
        rest_itabs = rest_vtabs = ()
        fi_dense = fx_dense = None
        if interior_blocks != "never":
            from .dist import _build_frontier_dense, _build_interior_blocks

            hyb = _build_interior_blocks(int_groups, Mb, Nb, block_B)
            if hyb is not None:
                int_blocks, int_srow, int_scol, rest_groups = hyb
                rest_itabs, rest_vtabs, _unused, rest_inv, _ = (
                    _build_group_ell(rest_groups, Mb, sentinel=Nb,
                                     E_total=E)
                )
                # Dense frontier stores, decided per tier with the same
                # measured rule (buffer lengths: C*Hi intra, C*S*Hx
                # cross — _build_frontier_dense only uses the product).
                fi_dense = _build_frontier_dense(
                    fi_groups, Mb, Hi, C, mode=frontier_dense
                )
                fx_dense = _build_frontier_dense(
                    fx_groups, Mb, Hx, C * S, mode=frontier_dense
                )
        fi_itabs, fi_vtabs, fi_etabs, fi_inv, _ = _build_group_ell(
            fi_groups, Mb, sentinel=C * Hi, E_total=E
        )
        fx_itabs, fx_vtabs, fx_etabs, fx_inv, _ = _build_group_ell(
            fx_groups, Mb, sentinel=C * S * Hx, E_total=E
        )
        rowcount = np.bincount(
            row, minlength=Pn * Mb
        ).reshape(Pn, Mb).astype(np.int32)

        hier_cross_rows = sum(
            int(u.size) for per in dcn_cols for u in per
        )
        ici_rows = sum(int(u.size) for per in ici_cols for u in per)
        wire_stats = {
            # real distinct rows crossing DCN per step, after/without
            # the slice-level union dedup
            "dcn_rows_hier": hier_cross_rows,
            "dcn_rows_flat": int(flat_cross_rows),
            "ici_rows": ici_rows,
            # padded on-the-wire row slots (what the collectives move)
            "dcn_row_slots": Pn * S * Hx,
            "ici_row_slots": Pn * C * Hi + Pn * (C * S * Hx),
        }

        spec = lambda nd: P((dcn_axis, data_axis), *([None] * (nd - 1)))  # noqa: E731

        def put(x):
            return jax.device_put(
                x, NamedSharding(mesh, spec(x.ndim))
            )

        return cls(
            mesh, M, N, Mb, Nb, S, C,
            [put(t) for t in int_itabs], [put(t) for t in int_vtabs],
            [put(t) for t in int_etabs], put(int_inv),
            [put(t) for t in fi_itabs], [put(t) for t in fi_vtabs],
            [put(t) for t in fi_etabs], put(fi_inv),
            put(jnp.asarray(serve_ici)),
            [put(t) for t in fx_itabs], [put(t) for t in fx_vtabs],
            [put(t) for t in fx_etabs], put(fx_inv),
            put(jnp.asarray(serve_dcn)),
            Hi, Hx, rowcount=put(jnp.asarray(rowcount)), nnz=E,
            wire_stats=wire_stats,
            int_blocks=None if int_blocks is None else put(int_blocks),
            int_srow=None if int_srow is None else put(int_srow),
            int_scol=None if int_scol is None else put(int_scol),
            rest_itabs=[put(t) for t in rest_itabs],
            rest_vtabs=[put(t) for t in rest_vtabs],
            rest_inv=None if rest_inv is None else put(rest_inv),
            block_B=block_B,
            fi_dense=None if fi_dense is None else put(fi_dense),
            fx_dense=None if fx_dense is None else put(fx_dense),
        )

    # ------------------------------------------------------------------
    @property
    def _xspec(self):
        return P((dcn_axis, data_axis), None, None)

    def shard_dense(self, x: jnp.ndarray) -> jnp.ndarray:
        """(N, K) -> (P, Nb, K) row blocks, sharded over both axes."""
        K = x.shape[1]
        pad = self.P * self.Nb - x.shape[0]
        xb = jnp.pad(x, ((0, pad), (0, 0))).reshape(self.P, self.Nb, K)
        return jax.device_put(xb, NamedSharding(self.mesh, self._xspec))

    def unshard_dense(self, y: jnp.ndarray) -> jnp.ndarray:
        return y.reshape(self.P * self.Mb, -1)[: self.M]

    def wire_report(self, K: int = 128, itemsize: int = 4):
        """Per-step fabric bytes (real rows x K x itemsize): the flat
        1-D halo schedule's cross-slice traffic vs this schedule's
        slice-deduped DCN traffic, plus the full ICI leg (intra-slice
        halos AND the all_gather that spreads each received union row to
        the slice's other C-1 chips)."""
        w = self.wire_stats
        ici_rows = w["ici_rows"] + (self.C - 1) * w["dcn_rows_hier"]
        return {
            "dcn_bytes_flat": w["dcn_rows_flat"] * K * itemsize,
            "dcn_bytes_hier": w["dcn_rows_hier"] * K * itemsize,
            "dcn_dedup_factor": (
                w["dcn_rows_flat"] / w["dcn_rows_hier"]
                if w["dcn_rows_hier"] else 1.0
            ),
            "ici_bytes": ici_rows * K * itemsize,
        }


def _hier_flatten(s: HierShardedSparseMatrix):
    children = (
        s.int_itabs, s.int_vtabs, s.int_etabs, s.int_inv,
        s.fi_itabs, s.fi_vtabs, s.fi_etabs, s.fi_inv, s.serve_ici,
        s.fx_itabs, s.fx_vtabs, s.fx_etabs, s.fx_inv, s.serve_dcn,
        s.rowcount,
        s.int_blocks, s.int_srow, s.int_scol,
        s.rest_itabs, s.rest_vtabs, s.rest_inv,
        s.fi_dense, s.fx_dense,
    )
    aux = (s.mesh, s.M, s.N, s.Mb, s.Nb, s.S, s.C, s.Hi, s.Hx, s.nnz,
           tuple(sorted(s.wire_stats.items())), s.block_B)
    return children, aux


def _hier_unflatten(aux, ch) -> HierShardedSparseMatrix:
    mesh, M, N, Mb, Nb, S, C, Hi, Hx, nnz, ws, block_B = aux
    return HierShardedSparseMatrix(
        mesh, M, N, Mb, Nb, S, C,
        ch[0], ch[1], ch[2], ch[3],
        ch[4], ch[5], ch[6], ch[7], ch[8],
        ch[9], ch[10], ch[11], ch[12], ch[13],
        Hi, Hx, rowcount=ch[14], nnz=nnz, wire_stats=dict(ws),
        int_blocks=ch[15], int_srow=ch[16], int_scol=ch[17],
        rest_itabs=ch[18], rest_vtabs=ch[19], rest_inv=ch[20],
        block_B=block_B, fi_dense=ch[21], fx_dense=ch[22],
    )


jax.tree_util.register_pytree_node(
    HierShardedSparseMatrix, _hier_flatten, _hier_unflatten
)


def _hier_local(is_min,
                int_itabs, int_vtabs, int_etabs, int_inv,
                fi_itabs, fi_vtabs, fi_etabs, fi_inv, serve_ici,
                fx_itabs, fx_vtabs, fx_etabs, fx_inv, serve_dcn,
                x_local):
    x = x_local[0]                                    # (Nb, K)
    K = x.shape[1]
    # DCN leg first — it has the longest latency, and neither the
    # interior SpMM nor the ICI exchange depends on it, so XLA's
    # latency-hiding scheduler overlaps all three.
    served_dcn = jnp.take(x, serve_dcn[0], axis=0)    # (S, Hx, K)
    halo_dcn = lax.all_to_all(
        served_dcn, dcn_axis, split_axis=0, concat_axis=0, tiled=True
    )                                                 # (S, Hx, K)
    union = lax.all_gather(halo_dcn, data_axis, tiled=True)
    # (C*S, Hx, K): [c'*S + s'] = rows of block (s', c') for my slice
    served_ici = jnp.take(x, serve_ici[0], axis=0)    # (C, Hi, K)
    halo_ici = lax.all_to_all(
        served_ici, data_axis, split_axis=0, concat_axis=0, tiled=True
    )                                                 # (C, Hi, K)

    one = lambda ts: [t[0] for t in ts]  # noqa: E731
    if is_min is None:
        out = _group_ell_apply(
            one(int_itabs), one(int_vtabs), int_inv[0], x
        )
        out = out + _group_ell_apply(
            one(fi_itabs), one(fi_vtabs), fi_inv[0],
            halo_ici.reshape(-1, K),
        )
        out = out + _group_ell_apply(
            one(fx_itabs), one(fx_vtabs), fx_inv[0],
            union.reshape(-1, K),
        )
        return out[None]
    oa = _group_ell_minmax(
        one(int_itabs), one(int_vtabs), one(int_etabs), int_inv[0], x,
        is_min,
    )
    oa = _combine_minmax(oa, _group_ell_minmax(
        one(fi_itabs), one(fi_vtabs), one(fi_etabs), fi_inv[0],
        halo_ici.reshape(-1, K), is_min,
    ), is_min)
    oa = _combine_minmax(oa, _group_ell_minmax(
        one(fx_itabs), one(fx_vtabs), one(fx_etabs), fx_inv[0],
        union.reshape(-1, K), is_min,
    ), is_min)
    out, arg = oa
    return out[None], arg[None]


def _hier_local_hyb(Mb, B, use_fid, use_fxd,
                    blocks, srow, scol,
                    rest_itabs, rest_vtabs, rest_inv,
                    fi_itabs, fi_vtabs, fi_inv, serve_ici,
                    fx_itabs, fx_vtabs, fx_inv, serve_dcn,
                    fi_dense, fx_dense,
                    x_local):
    """Hierarchical schedule with the hybrid local format: the interior
    dense blocks run one batched MXU pass (parallel/dist.py design),
    the remainder stays on the group-ELL tables, and each frontier tier
    independently runs either group-ELL gathers or (``use_fid`` /
    ``use_fxd``) one MXU matmul of its baked dense store against the
    received buffer."""
    from ..ops.kernels.hybrid import _block_pass, _mxu_einsum, _prec

    x = x_local[0]                                    # (Nb, K)
    K = x.shape[1]
    served_dcn = jnp.take(x, serve_dcn[0], axis=0)
    halo_dcn = lax.all_to_all(
        served_dcn, dcn_axis, split_axis=0, concat_axis=0, tiled=True
    )
    union = lax.all_gather(halo_dcn, data_axis, tiled=True)
    served_ici = jnp.take(x, serve_ici[0], axis=0)
    halo_ici = lax.all_to_all(
        served_ici, data_axis, split_axis=0, concat_axis=0, tiled=True
    )
    one = lambda ts: [t[0] for t in ts]  # noqa: E731
    Nb = x.shape[0]
    Rb, Cb = -(-Mb // B), -(-Nb // B)
    pad = Cb * B - Nb
    xb = jnp.concatenate([x, jnp.zeros((pad, K), x.dtype)]) if pad else x
    acc = jnp.promote_types(x.dtype, jnp.float32)
    outb = _block_pass(
        blocks[0], srow[0], scol[0], xb.reshape(Cb, B, K),
        Rb, B, K, acc, _prec(None),
    )
    out = outb.reshape(Rb * B, K)[:Mb].astype(x.dtype)
    if rest_itabs:
        out = out + _group_ell_apply(
            one(rest_itabs), one(rest_vtabs), rest_inv[0], x
        )
    if use_fid:
        fi_out = _mxu_einsum("sbc,sck->sbk", acc, _prec(None),
                             fi_dense, halo_ici.reshape(1, -1, K))
        out = out + fi_out[0].astype(x.dtype)
    else:
        out = out + _group_ell_apply(
            one(fi_itabs), one(fi_vtabs), fi_inv[0],
            halo_ici.reshape(-1, K)
        )
    if use_fxd:
        fx_out = _mxu_einsum("sbc,sck->sbk", acc, _prec(None),
                             fx_dense, union.reshape(1, -1, K))
        out = out + fx_out[0].astype(x.dtype)
    else:
        out = out + _group_ell_apply(
            one(fx_itabs), one(fx_vtabs), fx_inv[0], union.reshape(-1, K)
        )
    return out[None]


def dist_spmm_hier(
    A: HierShardedSparseMatrix, x_sharded: jnp.ndarray,
    reduce: str = "sum", local_format: str = "ell",
    value=None,
):
    """Hierarchy-aware SpMM: interior compute + intra-slice halos over
    ICI + slice-deduplicated cross-slice unions over DCN.  Same 4-mode
    reduce contract (and argout semantics) as ``dist_spmm``;
    ``local_format`` as in :func:`..dist.dist_spmm_halo` (``"hybrid"``
    puts the interior dense blocks on the MXU for sum/mean).

    ``value``: optional EDGE-SPACE value override (nnz,) in original
    edge ids, differentiable exactly as in ``dist_spmm`` (the slot
    tables are rebuilt through the edge-id tables); forces the ELL
    local format."""
    is_min = _is_min_of(reduce)
    spec3 = P((dcn_axis, data_axis), None, None)
    xspec = A._xspec
    use_hyb = (
        local_format in ("hybrid", "auto")
        and A.has_interior_blocks() and is_min is None
        and value is None
    )
    if local_format == "hybrid" and not use_hyb:
        raise ValueError(
            "local_format='hybrid' needs interior blocks, reduce in "
            "sum/mean, and no edge-space value override; use 'auto' to "
            "fall back silently"
        )
    if use_hyb:
        spec2 = P((dcn_axis, data_axis), None)
        use_fid = A.fi_dense is not None
        use_fxd = A.fx_dense is not None
        fn = jax.shard_map(
            partial(_hier_local_hyb, A.Mb, A.block_B, use_fid, use_fxd),
            mesh=A.mesh,
            in_specs=(
                P((dcn_axis, data_axis), None, None, None),
                spec2, spec2,
                tuple(spec3 for _ in A.rest_itabs),
                tuple(spec3 for _ in A.rest_vtabs),
                spec2,
                tuple(spec3 for _ in A.fi_itabs),
                tuple(spec3 for _ in A.fi_vtabs),
                spec2,
                spec3,
                tuple(spec3 for _ in A.fx_itabs),
                tuple(spec3 for _ in A.fx_vtabs),
                spec2,
                spec3,
                spec3,
                spec3,
                xspec,
            ),
            out_specs=xspec,
        )
        res = fn(A.int_blocks, A.int_srow, A.int_scol,
                 A.rest_itabs, A.rest_vtabs, A.rest_inv,
                 A.fi_itabs, A.fi_vtabs, A.fi_inv, A.serve_ici,
                 A.fx_itabs, A.fx_vtabs, A.fx_inv, A.serve_dcn,
                 A.fi_dense, A.fx_dense,
                 x_sharded)
        return _postprocess(A, res, None, reduce, x_sharded.dtype)
    fn = jax.shard_map(
        partial(_hier_local, is_min),
        mesh=A.mesh,
        in_specs=(
            tuple(spec3 for _ in A.int_itabs),
            tuple(spec3 for _ in A.int_vtabs),
            tuple(spec3 for _ in A.int_etabs),
            P((dcn_axis, data_axis), None),
            tuple(spec3 for _ in A.fi_itabs),
            tuple(spec3 for _ in A.fi_vtabs),
            tuple(spec3 for _ in A.fi_etabs),
            P((dcn_axis, data_axis), None),
            spec3,
            tuple(spec3 for _ in A.fx_itabs),
            tuple(spec3 for _ in A.fx_vtabs),
            tuple(spec3 for _ in A.fx_etabs),
            P((dcn_axis, data_axis), None),
            spec3,
            xspec,
        ),
        out_specs=xspec if is_min is None else (xspec, xspec),
    )
    int_vtabs, fi_vtabs, fx_vtabs = A.int_vtabs, A.fi_vtabs, A.fx_vtabs
    if value is not None:
        from .dist import _vtabs_from_value

        int_vtabs = _vtabs_from_value(value, A.int_etabs)
        fi_vtabs = _vtabs_from_value(value, A.fi_etabs)
        fx_vtabs = _vtabs_from_value(value, A.fx_etabs)
    res = fn(A.int_itabs, int_vtabs, A.int_etabs, A.int_inv,
             A.fi_itabs, fi_vtabs, A.fi_etabs, A.fi_inv, A.serve_ici,
             A.fx_itabs, fx_vtabs, A.fx_etabs, A.fx_inv, A.serve_dcn,
             x_sharded)
    if is_min is None:
        return _postprocess(A, res, None, reduce, x_sharded.dtype)
    return _postprocess(A, res[0], res[1], reduce, x_sharded.dtype)
