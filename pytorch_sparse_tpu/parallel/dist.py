"""Row-partitioned distributed SpMM over a device mesh.

New work relative to the reference (it has no distributed runtime,
SURVEY.md §2.3); the layout contract follows the reference's METIS
``partition`` output (``partptr`` row blocks, ``metis.py:24-75``) and the
block-diagonal composition primitives (``cat_diag`` / ``__narrow_diag__``).

Two SpMM schedules:

* ``dist_spmm_allgather`` — each shard all-gathers the dense operand, then
  reduces its own row block.  One collective, simple, best when K is small
  or the graph is dense enough that every shard touches most column blocks.
* ``dist_spmm_ring`` — the dense operand's row blocks rotate around the
  mesh ring with ``ppermute`` while each shard consumes the edge *bucket*
  targeting the currently-resident block; compute at step ``s`` overlaps
  the transfer for step ``s+1`` (ring-attention-style KV rotation, over ICI
  on hardware).  Peak memory per chip: one X block instead of all of X.

Edges live in fixed-shape padded buckets so every schedule is a static-shape
``shard_map`` program: bucket ``(p, q)`` holds shard ``p``'s edges whose
column falls in block ``q``, padded with zero-valued self-edges.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..segment import segment_sum
from ..tensor import SparseTensor
from .mesh import data_axis


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


class ShardedSparseMatrix:
    """A row-partitioned sparse matrix resident across a 1-D mesh.

    Arrays (all padded, leading dim sharded over the mesh axis):
      bucket_row   (P, P, Eb) int32 -- row index local to the owning shard
      bucket_col   (P, P, Eb) int32 -- col index local to the column block
      bucket_value (P, P, Eb) float -- value (0 on padding)
      flat_row / flat_col / flat_value (P, Ef) -- per-shard edge list with
          *global* columns, for the all-gather schedule.
    """

    def __init__(self, mesh: Mesh, M: int, N: int, Mb: int, Nb: int,
                 bucket_row, bucket_col, bucket_value,
                 flat_row, flat_col, flat_value):
        self.mesh = mesh
        self.M, self.N = M, N
        self.Mb, self.Nb = Mb, Nb
        self.P = mesh.devices.size
        self.bucket_row = bucket_row
        self.bucket_col = bucket_col
        self.bucket_value = bucket_value
        self.flat_row = flat_row
        self.flat_col = flat_col
        self.flat_value = flat_value

    @classmethod
    def from_sparse_tensor(
        cls, A: SparseTensor, mesh: Mesh
    ) -> "ShardedSparseMatrix":
        """Partition ``A``'s rows into contiguous blocks of ``ceil(M/P)``.

        For METIS-aware layouts, permute ``A`` first (``partition()``) so
        block boundaries match cluster boundaries and ring traffic is
        minimized.
        """
        Pn = mesh.devices.size
        M, N = A.sparse_sizes()
        Mb, Nb = _cdiv(M, Pn), _cdiv(N, Pn)

        row = np.asarray(A.storage.row())
        col = np.asarray(A.storage.col())
        value = A.storage.value()
        value_np = (
            np.asarray(value)
            if value is not None
            else np.ones(row.shape, np.float32)
        )

        owner = row // Mb
        block = col // Nb

        # --- flat per-shard lists (all-gather schedule)
        flat_counts = np.bincount(owner, minlength=Pn)
        Ef = max(int(flat_counts.max()), 1)
        flat_row = np.zeros((Pn, Ef), np.int32)
        flat_col = np.zeros((Pn, Ef), np.int32)
        flat_value = np.zeros((Pn, Ef), value_np.dtype)
        for p in range(Pn):
            sel = owner == p
            n = int(sel.sum())
            flat_row[p, :n] = row[sel] - p * Mb
            flat_col[p, :n] = col[sel]
            flat_value[p, :n] = value_np[sel]

        # --- (shard, block) buckets (ring schedule)
        pair_counts = np.zeros((Pn, Pn), np.int64)
        np.add.at(pair_counts, (owner, block), 1)
        Eb = max(int(pair_counts.max()), 1)
        bucket_row = np.zeros((Pn, Pn, Eb), np.int32)
        bucket_col = np.zeros((Pn, Pn, Eb), np.int32)
        bucket_value = np.zeros((Pn, Pn, Eb), value_np.dtype)
        for p in range(Pn):
            selp = owner == p
            for q in range(Pn):
                sel = selp & (block == q)
                n = int(sel.sum())
                bucket_row[p, q, :n] = row[sel] - p * Mb
                bucket_col[p, q, :n] = col[sel] - q * Nb
                bucket_value[p, q, :n] = value_np[sel]

        shard3 = NamedSharding(mesh, P(data_axis, None, None))
        shard2 = NamedSharding(mesh, P(data_axis, None))
        return cls(
            mesh, M, N, Mb, Nb,
            jax.device_put(bucket_row, shard3),
            jax.device_put(bucket_col, shard3),
            jax.device_put(bucket_value, shard3),
            jax.device_put(flat_row, shard2),
            jax.device_put(flat_col, shard2),
            jax.device_put(flat_value, shard2),
        )

    # ------------------------------------------------------------------
    def shard_dense(self, x: jnp.ndarray) -> jnp.ndarray:
        """(N, K) dense operand -> (P, Nb, K) stacked row blocks, sharded."""
        K = x.shape[1]
        pad = self.P * self.Nb - x.shape[0]
        if pad:
            x = jnp.concatenate([x, jnp.zeros((pad, K), x.dtype)])
        x = x.reshape(self.P, self.Nb, K)
        return jax.device_put(
            x, NamedSharding(self.mesh, P(data_axis, None, None))
        )

    def unshard_dense(self, y: jnp.ndarray) -> jnp.ndarray:
        """(P, Mb, K) stacked output -> (M, K)."""
        return y.reshape(self.P * self.Mb, -1)[: self.M]


def _shmat_flatten(s: ShardedSparseMatrix):
    children = (
        s.bucket_row, s.bucket_col, s.bucket_value,
        s.flat_row, s.flat_col, s.flat_value,
    )
    return children, (s.mesh, s.M, s.N, s.Mb, s.Nb)


def _shmat_unflatten(aux, children) -> ShardedSparseMatrix:
    mesh, M, N, Mb, Nb = aux
    return ShardedSparseMatrix(mesh, M, N, Mb, Nb, *children)


jax.tree_util.register_pytree_node(
    ShardedSparseMatrix, _shmat_flatten, _shmat_unflatten
)


def _allgather_local(Mb, flat_row, flat_col, flat_value, x_local):
    x_full = lax.all_gather(x_local[0], data_axis, tiled=True)  # (N_pad, K)
    h = jnp.take(x_full, flat_col[0], axis=0)
    h = h * flat_value[0][:, None].astype(h.dtype)
    out = segment_sum(h, flat_row[0], Mb)
    return out[None]


def _ring_local(Mb, Pn, bucket_row, bucket_col, bucket_value, x_local):
    me = lax.axis_index(data_axis)
    xblk = x_local[0]  # (Nb, K)
    K = xblk.shape[1]
    # Mark the zero accumulator as device-varying over the mesh axis up
    # front: ppermute produces varying values, and lax.fori_loop requires
    # the carry type to be loop-invariant.
    out0 = lax.pvary(jnp.zeros((Mb, K), xblk.dtype), (data_axis,))

    def step(s, carry):
        out, xblk = carry
        owner = (me + s) % Pn
        r = jnp.take(bucket_row[0], owner, axis=0)
        c = jnp.take(bucket_col[0], owner, axis=0)
        v = jnp.take(bucket_value[0], owner, axis=0)
        h = jnp.take(xblk, c, axis=0) * v[:, None].astype(xblk.dtype)
        out = out + segment_sum(h, r, Mb)
        # Rotate: i receives from (i+1), so after s steps we hold block
        # (me + s) % P -- the transfer for step s+1 overlaps this compute.
        xblk = lax.ppermute(
            xblk, data_axis,
            perm=[(i, (i - 1) % Pn) for i in range(Pn)],
        )
        return out, xblk

    out, _ = lax.fori_loop(0, Pn, step, (out0, xblk), unroll=True)
    return out[None]


def dist_spmm_allgather(
    A: ShardedSparseMatrix, x_sharded: jnp.ndarray
) -> jnp.ndarray:
    """x_sharded: (P, Nb, K) from :meth:`shard_dense`. Returns (P, Mb, K)."""
    fn = jax.shard_map(
        partial(_allgather_local, A.Mb),
        mesh=A.mesh,
        in_specs=(
            P(data_axis, None), P(data_axis, None), P(data_axis, None),
            P(data_axis, None, None),
        ),
        out_specs=P(data_axis, None, None),
    )
    return fn(A.flat_row, A.flat_col, A.flat_value, x_sharded)


def dist_spmm_ring(
    A: ShardedSparseMatrix, x_sharded: jnp.ndarray
) -> jnp.ndarray:
    """Ring-rotated SpMM with overlapped halo exchange. Returns (P, Mb, K)."""
    fn = jax.shard_map(
        partial(_ring_local, A.Mb, A.P),
        mesh=A.mesh,
        in_specs=(
            P(data_axis, None, None), P(data_axis, None, None),
            P(data_axis, None, None), P(data_axis, None, None),
        ),
        out_specs=P(data_axis, None, None),
    )
    return fn(A.bucket_row, A.bucket_col, A.bucket_value, x_sharded)


def dist_spmm(
    A: ShardedSparseMatrix, x_sharded: jnp.ndarray, schedule: str = "ring"
) -> jnp.ndarray:
    if schedule == "ring":
        return dist_spmm_ring(A, x_sharded)
    elif schedule == "allgather":
        return dist_spmm_allgather(A, x_sharded)
    raise ValueError(f"Unknown schedule: {schedule!r}")
