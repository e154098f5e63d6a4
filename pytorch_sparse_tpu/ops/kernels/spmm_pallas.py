"""Pallas TPU kernel: sorted-segment reduction for SpMM.

Why this kernel exists.  The XLA lowering of ``segment_sum`` (a scatter)
dominates SpMM on TPU: measured on a v5e at ogbn-arxiv scale
(E=1.17M, K=128, fp32), the gather ``mat[col]`` costs ~2.3 ms while the
scatter-style segment-sum costs ~9.7 ms of a 12 ms SpMM.  The TPU has no
fast scatter; what it does have is a sequential grid, VMEM-resident
output blocks, and a 128x128 MXU.  So the reduction is reformulated as a
chain of tiny dense matmuls:

    out[block_i] = sum_over_chunks  onehot(rows_chunk)^T @ h_chunk

where ``h = mat[col] * value`` is pre-gathered by XLA (its gather is
near-bandwidth already), edges are CSR-sorted so each output row block is
touched by a contiguous run of edge chunks, and the one-hot matrix is
built on the VPU from the chunk's row ids.  The output block stays
resident in VMEM across its chunk run (Pallas revisiting); each chunk is
one (TM x C) @ (C x K) MXU matmul.  One-hot entries are exactly 0/1, so
with float32 accumulation the result is exact up to summation order —
the same contract as ``jax.ops.segment_sum``.

This mirrors the role of the reference's CUDA merge-spmm kernel
(``csrc/cuda/spmm_cuda.cu:13-90``): the hot per-row reduction, re-designed
for the TPU's memory system instead of warp shuffles.

Static-shape discipline: the (block, chunk) schedule is data-dependent
(it derives from ``rowptr``), so it is computed once per graph on the
host (``build_chunk_table``) and cached on the storage object like every
other format cache (SURVEY.md §7.1).  Under ``jit`` the table rides the
pytree as three int32 arrays consumed via scalar prefetch.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

try:  # pallas is TPU/Mosaic-only at runtime; import must not break CPU
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _PALLAS_IMPORTED = True
except Exception:  # pragma: no cover
    _PALLAS_IMPORTED = False


def pallas_available() -> bool:
    """True when the default backend can run Mosaic TPU kernels."""
    if not _PALLAS_IMPORTED:
        return False
    try:
        platform = jax.default_backend()
    except Exception:  # pragma: no cover
        return False
    # The remote-TPU ("axon") backend reports its own platform name but
    # executes TPU programs; accept any platform whose devices identify
    # as TPUs.
    if platform == "tpu":
        return True
    try:
        return any("TPU" in str(d.device_kind).upper() for d in jax.devices())
    except Exception:  # pragma: no cover
        return False


# ----------------------------------------------------------------------
# Host-side schedule construction
# ----------------------------------------------------------------------

def build_chunk_table(
    rowptr: np.ndarray, M: int, TM: int, C: int
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, int]:
    """Build the (block, chunk) schedule for the reduce kernel.

    For each row block ``i`` (TM rows), its CSR edge range
    ``[rowptr[i*TM], rowptr[min((i+1)*TM, M)])`` is covered by C-aligned
    edge chunks.  Stray edges of neighboring blocks inside an aligned
    chunk are masked in-kernel by their row ids, so overlap is harmless.
    Empty blocks still get one (fully masked) chunk so their output block
    is zero-initialized.

    Returns ``(chunk_block, chunk_eblk, chunk_first, n_blocks, n_slots)``
    where ``chunk_eblk`` is the chunk's edge offset in units of C,
    ``chunk_first`` flags the first chunk of each block, and ``n_slots``
    is the number of C-aligned edge slots the kernel will address (the
    caller must pad the edge arrays to ``n_slots * C``).
    """
    rowptr = np.asarray(rowptr, dtype=np.int64)
    n_blocks = max(1, -(-M // TM))
    blk_start = rowptr[np.minimum(np.arange(n_blocks) * TM, M)]
    blk_end = rowptr[np.minimum((np.arange(n_blocks) + 1) * TM, M)]
    first_chunk = blk_start // C
    # Blocks always get >= 1 chunk (zero-init of empty blocks).
    last_chunk = np.maximum((blk_end - 1) // C, first_chunk)
    counts = (last_chunk - first_chunk + 1).astype(np.int64)
    total = int(counts.sum())

    chunk_block = np.repeat(np.arange(n_blocks, dtype=np.int32), counts)
    run_start = np.concatenate([[0], np.cumsum(counts)[:-1]])
    within = np.arange(total, dtype=np.int64) - run_start[chunk_block]
    chunk_eblk = (first_chunk[chunk_block] + within).astype(np.int32)
    chunk_first = (within == 0).astype(np.int32)
    n_slots = int(chunk_eblk.max()) + 1
    return chunk_block, chunk_eblk, chunk_first, n_blocks, n_slots


# ----------------------------------------------------------------------
# Kernel
# ----------------------------------------------------------------------

def _reduce_kernel(TM: int, cb_ref, ce_ref, fi_ref, row_ref, h_ref, out_ref):
    t = pl.program_id(0)
    blk = cb_ref[t]
    # (1, C) local row ids; strays/padding fall outside [0, TM).
    lr = row_ref[:] - blk * TM
    onehot = (
        jax.lax.broadcasted_iota(jnp.int32, (TM, lr.shape[1]), 0) == lr
    ).astype(jnp.float32)
    partial = jax.lax.dot(
        onehot,
        h_ref[:].astype(jnp.float32),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )

    @pl.when(fi_ref[t] == 1)
    def _():
        out_ref[:] = partial.astype(out_ref.dtype)

    @pl.when(fi_ref[t] == 0)
    def _():
        out_ref[:] = out_ref[:] + partial.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("TM", "C", "n_blocks"))
def _sorted_segment_reduce_call(
    h, row2d, chunk_block, chunk_eblk, chunk_first, TM, C, n_blocks
):
    K = h.shape[1]
    n_chunks = chunk_block.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec(
                (1, C), lambda t, cb, ce, fi: (0, ce[t]),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (C, K), lambda t, cb, ce, fi: (ce[t], 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (TM, K), lambda t, cb, ce, fi: (cb[t], 0),
            memory_space=pltpu.VMEM,
        ),
    )
    return pl.pallas_call(
        functools.partial(_reduce_kernel, TM),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_blocks * TM, K), h.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(chunk_block, chunk_eblk, chunk_first, row2d, h)


def sorted_segment_reduce_matmul(
    h: jnp.ndarray,
    row: jnp.ndarray,
    chunk_block: jnp.ndarray,
    chunk_eblk: jnp.ndarray,
    chunk_first: jnp.ndarray,
    M: int,
    n_slots: int,
    TM: int = 128,
    C: int = 2048,
) -> jnp.ndarray:
    """Segment-sum ``h`` (E, K) by sorted ``row`` ids into (M, K).

    ``h`` rows beyond E (alignment padding) are masked by row ids, which
    the caller must pad with an out-of-range id (e.g. M).  ``chunk_*``
    and ``n_slots`` come from :func:`build_chunk_table` on the same
    (TM, C).  Pass ``h``/``row`` already padded to ``n_slots * C`` rows
    to avoid a full-size device copy here.
    """
    E = h.shape[0]
    n_blocks = max(1, -(-M // TM))
    E_pad = n_slots * C
    if E_pad > E:
        h = jnp.concatenate(
            [h, jnp.zeros((E_pad - E, h.shape[1]), h.dtype)], axis=0
        )
        row = jnp.concatenate(
            [row, jnp.full((E_pad - E,), M, row.dtype)], axis=0
        )
    K = h.shape[1]
    row2d = row.reshape(1, E_pad).astype(jnp.int32)
    out = _sorted_segment_reduce_call(
        h, row2d, chunk_block, chunk_eblk, chunk_first, TM, C, n_blocks
    )
    return out[:M]
