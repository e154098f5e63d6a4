"""Device-side block SpGEMM: the dense-block x dense-block part of a
sparse product as batched MXU matmuls (VERDICT r4 item 6).

The host Gustavson numeric pass (``csrc/native.cpp:spgemm_fill``) runs
at ~342 M terms/s on one core — at full-Reddit A*A (57.3 B expansion
terms) that is ~300 s while the TPU idles.  On community graphs the
bulk of those terms come from DENSE-block x DENSE-block products
(82.5% of Reddit's edges live in (512, 512) blocks, so ~68% of the
product terms are block-block), and a block-pair product is exactly
the MXU's shape: gather the two (B, B) operands, one batched matmul,
segment-sum partial products into the output block.

Traffic/compute at full-Reddit scale (7.5K blocks, ~10^5 matching
pairs): ~3 block moves per pair = a few hundred GB of HBM traffic
(sub-second at 819 GB/s) and ~10^14 bf16 flops (sub-second at
197 TFLOP/s) — the dense-block share of the product runs 2-3 orders
of magnitude faster than host Gustavson on the same terms.  The
REMAINDER cross-terms (D@R, R@D, R@R over the ~17% of edges outside
blocks) stay on the host streaming path (``ops/spgemm.py``), which
runs CONCURRENTLY with the device: end-to-end numeric wall-clock is
max(host cross-terms, device block pass).

Output streams as dense (B, B) blocks per output-block-row window —
C at these densities is itself block-dense (Reddit A*A is ~24% dense
overall), so dense blocks ARE its natural format; a window bounds
device memory exactly like ``spspmm_stream`` bounds host memory.

Reference: the reference library delegates SpGEMM entirely to
``torch.sparse.mm`` (``torch_sparse/matmul.py:97``) and has no
analogue of this kernel.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .hybrid import _mxu_einsum, get_block_precision

# Pairs per scan step: two (c, B, B) gathers + one (c, B, B) partial.
# At B=512 f32, c=256 keeps every operand slice ~268 MB — inside the
# measured 1 GB cliff with headroom.
_PAIR_CHUNK_BYTES = 256 << 20


def block_spgemm_plan(
    srowA: np.ndarray, scolA: np.ndarray,
    srowB: np.ndarray, scolB: np.ndarray,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Host pairing pass: all (a, b) block pairs with ``scolA[a] ==
    srowB[b]``, grouped by output block.

    Returns ``(a_idx, b_idx, out_seg, out_row, out_col)``: pair operand
    indices sorted by output block, the output-block segment id of each
    pair, and each output block's (row, col) coordinates.  O(pairs)
    host time — the block graph is ~4 orders smaller than the edge
    graph, so this "structure pass" is negligible."""
    orderB = np.argsort(srowB, kind="stable")
    sb = srowB[orderB]
    # B-row buckets
    n_k = int(max(sb.max() + 1 if sb.size else 1,
                  scolA.max() + 1 if scolA.size else 1))
    startB = np.searchsorted(sb, np.arange(n_k))
    endB = np.searchsorted(sb, np.arange(n_k), side="right")
    deg = endB[scolA] - startB[scolA]
    a_idx = np.repeat(np.arange(srowA.shape[0], dtype=np.int64), deg)
    total = int(deg.sum())
    run = np.concatenate([[0], np.cumsum(deg)[:-1]])
    off = np.arange(total, dtype=np.int64) - run[a_idx]
    b_idx = orderB[startB[scolA[a_idx]] + off]
    ncb = int(scolB.max() + 1) if scolB.size else 1
    key = srowA[a_idx].astype(np.int64) * ncb + scolB[b_idx]
    order = np.argsort(key, kind="stable")
    a_idx, b_idx, key = a_idx[order], b_idx[order], key[order]
    out_keys, out_seg = np.unique(key, return_inverse=True)
    return (a_idx, b_idx, out_seg.astype(np.int64),
            (out_keys // ncb).astype(np.int64),
            (out_keys % ncb).astype(np.int64))


def _pair_chunk(B: int, elem: int) -> int:
    return max(1, _PAIR_CHUNK_BYTES // max(B * B * elem, 1))


def block_spgemm_window(
    blocksA: jnp.ndarray, blocksB: jnp.ndarray,
    a_idx: np.ndarray, b_idx: np.ndarray, out_seg: np.ndarray,
    n_out: int, precision=None, acc_dtype=jnp.float32,
) -> jnp.ndarray:
    """Numeric pass for one window of output blocks.

    ``blocksA`` (nbA, B, B), ``blocksB`` (nbB, B, B) resident on
    device (f32 or bf16 stores; bf16 pairs ride native MXU passes via
    ``_mxu_einsum``).  ``a_idx/b_idx/out_seg`` from the plan,
    restricted to pairs whose output block lies in this window (seg ids
    re-based to [0, n_out)).  Returns (n_out, B, B) ``acc_dtype``
    blocks.  Pairs stream through a ``lax.scan`` in fixed chunks (the
    measured XLA:TPU rules: scan not unroll, operand slices under the
    2^31 cliff)."""
    if precision is None:
        precision = get_block_precision()
    Bb = int(blocksA.shape[1])
    elem = jnp.dtype(blocksA.dtype).itemsize
    npairs = int(a_idx.shape[0])
    out0 = jnp.zeros((n_out + 1, Bb, Bb), acc_dtype)
    if npairs == 0:
        return out0[:n_out]
    ch = _pair_chunk(Bb, max(elem, 2))
    nch = -(-npairs // ch)
    # Round the chunk count up to the next power of two: windows with
    # different pair counts then share log-many compiled programs
    # instead of one per window (each unique (nch, n_out) is a fresh
    # XLA compile — minutes each through the remote tunnel).
    nch = 1 << (nch - 1).bit_length()
    pad = nch * ch - npairs
    # padding pairs hit the sentinel output slot n_out with block 0 of
    # each operand; their product lands in the dropped slot.
    ai = np.concatenate([a_idx, np.zeros(pad, np.int64)])
    bi = np.concatenate([b_idx, np.zeros(pad, np.int64)])
    sg = np.concatenate([out_seg, np.full(pad, n_out, np.int64)])
    ai = jnp.asarray(ai.reshape(nch, ch).astype(np.int32))
    bi = jnp.asarray(bi.reshape(nch, ch).astype(np.int32))
    sg = jnp.asarray(sg.reshape(nch, ch).astype(np.int32))

    def step(carry, t):
        ia, ib, seg = t
        ab = jnp.take(blocksA, ia, axis=0)       # (ch, B, B)
        bb = jnp.take(blocksB, ib, axis=0)       # (ch, B, B)
        prod = _mxu_einsum("sbc,sck->sbk", acc_dtype, precision, ab, bb)
        carry = carry + jax.ops.segment_sum(
            prod, seg, num_segments=n_out + 1,
            indices_are_sorted=True,
        )
        return carry, None

    out, _ = jax.lax.scan(step, out0, (ai, bi, sg))
    return out[:n_out]


def block_spgemm_stream(
    blocksA: jnp.ndarray, srowA: np.ndarray, scolA: np.ndarray,
    blocksB: jnp.ndarray, srowB: np.ndarray, scolB: np.ndarray,
    max_out_blocks: int = 2048, precision=None,
    acc_dtype=jnp.float32,
) -> Iterator[Tuple[np.ndarray, np.ndarray, jnp.ndarray]]:
    """Stream C = A_blocks @ B_blocks as dense-block windows.

    Yields ``(out_rows, out_cols, C_blocks)`` with ``C_blocks``
    (n, B, B) on device and n <= ``max_out_blocks`` — window memory is
    bounded like ``spspmm_stream`` bounds host memory, and windows cut
    on output-block boundaries so every yielded block is COMPLETE
    (all its k-pairs reduced)."""
    a_idx, b_idx, out_seg, out_row, out_col = block_spgemm_plan(
        srowA, scolA, srowB, scolB
    )
    n_out_total = out_row.shape[0]
    if n_out_total == 0:
        return
    # pair ranges per output block (pairs are sorted by out_seg)
    seg_start = np.searchsorted(out_seg, np.arange(n_out_total))
    seg_end = np.concatenate([seg_start[1:], [out_seg.shape[0]]])
    lo = 0
    while lo < n_out_total:
        hi = min(lo + max_out_blocks, n_out_total)
        p0, p1 = int(seg_start[lo]), int(seg_end[hi - 1])
        # fixed n_out across windows (last window's tail slots stay
        # zero): one compiled program per pair-count bucket, not per
        # window.
        cblk = block_spgemm_window(
            blocksA, blocksB, a_idx[p0:p1], b_idx[p0:p1],
            out_seg[p0:p1] - lo, max_out_blocks, precision=precision,
            acc_dtype=acc_dtype,
        )
        yield out_row[lo:hi], out_col[lo:hi], cblk[:hi - lo]
        lo = hi
