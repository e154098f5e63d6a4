"""Benchmark alternative SpMM formulations on the current device.

Mirrors the reference's benchmark protocol (``benchmark/main.py:61-91``:
synchronized timing loops over feature widths, correctness pre-pass) but on
synthetic power-law graphs at ogbn-arxiv scale, since the SuiteSparse
downloads are unavailable offline.

Variants:
  scatter   -- h = mat[col] * value; out = zeros.at[row].add(h)
  segment   -- jax.ops.segment_sum(h, row) with sorted indices
  onehot    -- edge-chunked one-hot matmul partial sums + small scatter
  csr_dot   -- cusparse-style row-major: take + segment via cumsum diff
"""

import argparse
import os
import sys
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_graph(M, E, seed=0, power=1.1):
    """Synthetic graph with a power-law-ish degree distribution, sorted COO."""
    rng = np.random.RandomState(seed)
    # heavy-tailed row distribution
    row = rng.zipf(power + 1.0, size=E) % M if power else rng.randint(0, M, E)
    row = np.sort(rng.permutation(row).astype(np.int32))
    col = rng.randint(0, M, E).astype(np.int32)
    order = np.lexsort((col, row))
    row, col = row[order], col[order]
    value = rng.randn(E).astype(np.float32)
    return jnp.asarray(row), jnp.asarray(col), jnp.asarray(value)


def make_banded(M, E, seed=0, bandwidth=2000):
    """ldoor/StocF-like long-row banded synthetic (FEM regime): every
    row holds ~E/M nnz confined to a ``|i-j| <= bandwidth`` band — the
    reference's long-row SuiteSparse matrices (GHS_psdef/ldoor avg row
    49, Janna/StocF-1465 avg 71; ``benchmark/main.py:13-29``) are this
    shape.  High column locality, near-uniform degrees."""
    rng = np.random.RandomState(seed)
    row = np.sort(rng.randint(0, M, E).astype(np.int32))
    offs = rng.randint(-bandwidth, bandwidth + 1, E)
    col = np.clip(row.astype(np.int64) + offs, 0, M - 1).astype(np.int32)
    order = np.lexsort((col, row))
    row, col = row[order], col[order]
    value = rng.randn(E).astype(np.float32)
    return jnp.asarray(row), jnp.asarray(col), jnp.asarray(value)


def make_family(name, M, E, seed=0):
    """The four graph regimes of the bench protocol, mirroring the
    reference's SuiteSparse spread (short-row/web, power-law hub,
    long-row banded FEM, community)."""
    if name == "uniform":
        return make_graph(M, E, seed, power=0)
    if name == "powerlaw":
        return make_graph(M, E, seed, power=1.1)
    if name == "banded":
        return make_banded(M, E, seed)
    if name == "community":
        from pytorch_sparse_tpu.testing import community_graph

        A = community_graph(M, E, n_comm=max(M // 800, 2), seed=seed,
                            equal_sizes=True)
        r, c, v = A.coo()
        return r, c, v
    raise ValueError(f"unknown graph family {name!r}")


@partial(jax.jit, static_argnames=("M",))
def spmm_scatter(row, col, value, mat, M):
    h = jnp.take(mat, col, axis=0) * value[:, None]
    return jnp.zeros((M, mat.shape[1]), mat.dtype).at[row].add(h)


@partial(jax.jit, static_argnames=("M",))
def spmm_segment(row, col, value, mat, M):
    h = jnp.take(mat, col, axis=0) * value[:, None]
    return jax.ops.segment_sum(h, row, M, indices_are_sorted=True)


@partial(jax.jit, static_argnames=("M", "T"))
def spmm_onehot(row, col, value, mat, M, T=512):
    """Edge chunks of T; per-chunk one-hot matmul over local row offsets,
    then scatter the (nchunks, T)-bounded partials."""
    E = row.shape[0]
    K = mat.shape[1]
    h = jnp.take(mat, col, axis=0) * value[:, None]          # (E, K)
    nchunks = E // T
    hc = h[: nchunks * T].reshape(nchunks, T, K)
    rc = row[: nchunks * T].reshape(nchunks, T)
    base = rc[:, :1]
    local = rc - base                                         # (C, T) in [0, T)
    onehot = (
        local[:, None, :] == jnp.arange(T, dtype=row.dtype)[None, :, None]
    ).astype(jnp.bfloat16)                                    # (C, T, T)
    partial_sums = jax.lax.dot_general(
        onehot, hc.astype(jnp.bfloat16),
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )                                                         # (C, T, K)
    out_rows = base + jnp.arange(T, dtype=row.dtype)[None, :]
    out_rows = jnp.minimum(out_rows, M - 1)
    out = jnp.zeros((M, K), mat.dtype).at[out_rows.reshape(-1)].add(
        partial_sums.reshape(-1, K)
    )
    # tail
    if E % T:
        ht = h[nchunks * T:]
        rt = row[nchunks * T:]
        out = out.at[rt].add(ht)
    return out


@partial(jax.jit, static_argnames=("M",))
def spmm_cumsum(row, col, value, mat, M):
    h = jnp.take(mat, col, axis=0) * value[:, None]
    csum = jnp.cumsum(h, axis=0)
    csum = jnp.concatenate([jnp.zeros((1, h.shape[1]), h.dtype), csum])
    rowptr = jnp.searchsorted(row, jnp.arange(M + 1, dtype=row.dtype))
    return csum[rowptr[1:]] - csum[rowptr[:-1]]


_ELL_CACHE = {}


def _ell_tensor(row, col, value, M):
    import pytorch_sparse_tpu as ts

    key = (id(row), id(col), M)
    A = _ELL_CACHE.get(key)
    if A is None:
        A = ts.SparseTensor(
            row=row, col=col, value=value, sparse_sizes=(M, M),
            is_sorted=True, trust_data=True,
        )
        A.storage.ell()
        A.storage.ell_t()
        _ELL_CACHE[key] = A
    return A


def spmm_ell(row, col, value, mat, M):
    """The production fast path: degree-bucketed ELLPACK via SparseTensor.

    The tensor (with its ELL tables) must ride as a jit ARGUMENT — as a
    closure constant the tables push the remote-compile payload over its
    HTTP 413 body limit (see CLAUDE.md).  ``bench`` uses ``prebuild``.
    """
    import pytorch_sparse_tpu as ts

    return ts.spmm_sum(_ell_tensor(row, col, value, M), mat)


spmm_ell.prebuild = _ell_tensor


VARIANTS = {
    "scatter": spmm_scatter,
    "segment": spmm_segment,
    "onehot": spmm_onehot,
    "cumsum": spmm_cumsum,
    "ell": spmm_ell,
}


def bench(fn, args, iters=20, backward=False):
    from timing import device_time

    row, col, value, mat, M = args
    del iters
    if mat.shape[0] != M:
        raise ValueError("timing chain needs square operand")
    # Pass the index/value arrays as jit ARGUMENTS: closure constants
    # bloat the compile payload (remote tunnel rejects big bodies with
    # HTTP 413) and recompile per K.
    pre = getattr(fn, "prebuild", None)
    if pre is not None and not backward:
        import pytorch_sparse_tpu as ts

        A = pre(row, col, value, M)
        return device_time(lambda m, a: ts.spmm_sum(a, m), mat, A)
    if not backward:
        return device_time(
            lambda m, r, c, v: fn(r, c, v, m, M), mat, row, col, value
        )

    # forward + grads wrt (value, mat), the reference's optional backward
    # timing (benchmark/main.py:74-79).
    def step(m, r, c, v0):
        def loss(v, mm):
            return jnp.sum(fn(r, c, v, mm, M) ** 2)

        gv, gm = jax.grad(loss, argnums=(0, 1))(v0, m)
        return gm + m * 0

    return device_time(step, mat, row, col, value)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--M", type=int, default=169_343)      # ogbn-arxiv nodes
    p.add_argument("--E", type=int, default=1_166_243)    # ogbn-arxiv edges
    # Reference protocol sweeps widths 1..512 (benchmark/main.py:162-164).
    p.add_argument("--K", type=int, nargs="+",
                   default=[1, 16, 32, 64, 128, 256, 512])
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--variants", nargs="+", default=list(VARIANTS))
    p.add_argument("--graph", default="powerlaw",
                   choices=["uniform", "powerlaw", "banded", "community"],
                   help="graph regime (reference protocol spans "
                        "short-row, power-law, long-row banded and "
                        "community matrices)")
    p.add_argument("--backward", action="store_true",
                   help="time forward+backward (grads wrt value and mat)")
    args = p.parse_args()

    row, col, value = make_family(args.graph, args.M, args.E)
    dev = jax.devices()[0]
    print(f"# device={dev}, graph={args.graph}, M={args.M}, E={args.E}")

    for K in args.K:
        mat = jnp.asarray(
            np.random.RandomState(1).randn(args.M, K), jnp.float32
        )
        ref = None
        for name in args.variants:
            fn = VARIANTS[name]
            try:
                out = fn(row, col, value, mat, args.M)
                jax.block_until_ready(out)
            except Exception as e:
                print(f"K={K:4d} {name:8s} FAILED: {str(e)[:80]}")
                continue
            if ref is None:
                ref = out
                ok = True
            else:
                ok = bool(
                    jnp.allclose(out, ref, atol=1e-2 * K)
                )
            dt = bench(fn, (row, col, value, mat, args.M), args.iters,
                       backward=args.backward)
            nnzs = args.E / dt
            # bandwidth model: col+value+row reads, mat gather (E*K*4 no
            # reuse), out write (M*K*4)
            bytes_moved = args.E * 12 + args.E * K * 4 + args.M * K * 4
            gbs = bytes_moved / dt / 1e9
            print(
                f"K={K:4d} {name:8s} {dt * 1e3:8.3f} ms  "
                f"{nnzs / 1e9:6.2f} Gnnz/s  ~{gbs:6.1f} GB/s  ok={ok}"
            )


if __name__ == "__main__":
    main()
