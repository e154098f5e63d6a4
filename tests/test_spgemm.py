"""Large-product SpGEMM drivers (ops/spgemm.py): chunked plan vs
single-shot plan vs native Gustavson vs scipy oracle; streaming blocks;
diag-without-materialization; gradient flow through the chunked path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow
import scipy.sparse as sp

from pytorch_sparse_tpu import (
    SparseTensor, expansion_terms, spspmm_chunked, spspmm_diag,
    spspmm_native, spspmm_stream, spspmm_sum,
)
from pytorch_sparse_tpu.csrc import lib as native_lib


def _random_pair(rng, M=60, N=50, P=45, da=0.15, db=0.12, weighted=True):
    A = sp.random(M, N, density=da, random_state=rng, format="csr")
    B = sp.random(N, P, density=db, random_state=rng, format="csr")
    if not weighted:
        A.data[:] = 1.0
        B.data[:] = 1.0
    ta = SparseTensor.from_scipy(A)
    tb = SparseTensor.from_scipy(B)
    if not weighted:
        ta = ta.set_value(None, layout="coo")
        tb = tb.set_value(None, layout="coo")
    return A, B, ta, tb


def _assert_matches_scipy(C, A, B, atol=1e-5):
    ref = (A @ B).tocsr()
    ref.sort_indices()
    got = C.to_scipy(layout="csr")
    assert np.array_equal(np.asarray(got.indptr), ref.indptr)
    assert np.array_equal(np.asarray(got.indices), ref.indices)
    if C.storage.value() is not None:
        assert np.allclose(got.data, ref.data, atol=atol)


def test_expansion_terms():
    rng = np.random.RandomState(0)
    A, B, ta, tb = _random_pair(rng)
    degB = np.diff(B.indptr)
    assert expansion_terms(ta, tb) == int(degB[A.indices].sum())


@pytest.mark.parametrize("weighted", [True, False])
def test_chunked_matches_single_shot(weighted):
    rng = np.random.RandomState(1)
    A, B, ta, tb = _random_pair(rng, weighted=weighted)
    full = spspmm_sum(ta, tb)
    for max_terms in (64, 1024, 1 << 20):
        ck = spspmm_chunked(ta, tb, max_terms=max_terms)
        assert ck.storage.row().tolist() == full.storage.row().tolist()
        assert ck.storage.col().tolist() == full.storage.col().tolist()
        if weighted:
            assert np.allclose(ck.storage.value(), full.storage.value(),
                               atol=1e-6)
        _assert_matches_scipy(ck, A, B)


@pytest.mark.skipif(native_lib is None, reason="native lib not built")
@pytest.mark.parametrize("weighted", [True, False])
def test_native_matches_scipy(weighted):
    rng = np.random.RandomState(2)
    A, B, ta, tb = _random_pair(rng, weighted=weighted)
    C = spspmm_native(ta, tb)
    _assert_matches_scipy(C, A, B)
    # and agrees with the plan path
    full = spspmm_sum(ta, tb)
    assert C.storage.col().tolist() == full.storage.col().tolist()


def test_auto_dispatch_large(monkeypatch):
    # Force the large-product branch and check it matches the plan path.
    rng = np.random.RandomState(3)
    A, B, ta, tb = _random_pair(rng)
    full = spspmm_sum(ta, tb)
    import pytorch_sparse_tpu.ops.spgemm as spgemm_mod
    monkeypatch.setattr(spgemm_mod, "PLAN_MAX_TERMS", 100)
    C = spspmm_sum(ta, tb)
    _assert_matches_scipy(C, A, B)
    assert C.storage.col().tolist() == full.storage.col().tolist()


def test_stream_blocks_concatenate():
    rng = np.random.RandomState(4)
    A, B, ta, tb = _random_pair(rng)
    full = spspmm_sum(ta, tb)
    rows, cols, vals = [], [], []
    covered = 0
    for lo, hi, blk in spspmm_stream(ta, tb, max_terms=512):
        assert lo == covered
        covered = hi
        assert blk.sparse_size(0) == hi - lo
        r, c, v = blk.coo()
        rows.append(np.asarray(r) + lo)
        cols.append(np.asarray(c))
        vals.append(np.asarray(v))
    assert covered == ta.sparse_size(0)
    assert np.concatenate(rows).tolist() == full.storage.row().tolist()
    assert np.concatenate(cols).tolist() == full.storage.col().tolist()
    assert np.allclose(np.concatenate(vals), full.storage.value(), atol=1e-6)


@pytest.mark.parametrize("weighted", [True, False])
def test_spspmm_diag(weighted):
    rng = np.random.RandomState(5)
    for M, N, P in [(30, 25, 30), (20, 30, 40), (40, 30, 20)]:
        A, B, ta, tb = _random_pair(rng, M=M, N=N, P=P, weighted=weighted)
        d = np.asarray(spspmm_diag(ta, tb))
        if weighted:
            ref = np.diag((A @ B).toarray())
        else:
            Au = A.copy(); Au.data[:] = 1.0
            Bu = B.copy(); Bu.data[:] = 1.0
            ref = np.diag((Au @ Bu).toarray())
        assert d.shape[0] == min(M, P)
        assert np.allclose(d, ref[: min(M, P)], atol=1e-5)


def test_chunked_gradients_flow():
    # The chunked path must stay differentiable w.r.t. both value vectors
    # (the plan path's property, preserved per chunk).
    rng = np.random.RandomState(6)
    A, B, ta, tb = _random_pair(rng, M=25, N=20, P=22)

    rowA, colA = ta.storage.row(), ta.storage.col()
    rowB, colB = tb.storage.row(), tb.storage.col()
    va0 = ta.storage.value()
    vb0 = tb.storage.value()

    def loss(va, vb):
        a = SparseTensor(row=rowA, col=colA, value=va,
                         sparse_sizes=ta.sparse_sizes(), is_sorted=True,
                         trust_data=True)
        b = SparseTensor(row=rowB, col=colB, value=vb,
                         sparse_sizes=tb.sparse_sizes(), is_sorted=True,
                         trust_data=True)
        c = spspmm_chunked(a, b, max_terms=256)
        return jnp.sum(c.storage.value() ** 2)

    ga, gb = jax.grad(loss, argnums=(0, 1))(va0, vb0)
    assert np.isfinite(np.asarray(ga)).all() and np.abs(ga).sum() > 0
    assert np.isfinite(np.asarray(gb)).all() and np.abs(gb).sum() > 0

    # numeric check against finite differences on a few entries
    eps = 1e-3
    f0 = float(loss(va0, vb0))
    for i in [0, 3, 7]:
        va_p = va0.at[i].add(eps)
        fd = (float(loss(va_p, vb0)) - f0) / eps
        assert abs(fd - float(ga[i])) < 5e-1 * max(1.0, abs(fd))


def test_spspmm_diag_empty_operands():
    A = SparseTensor(row=jnp.array([0, 1]), col=jnp.array([1, 0]),
                     value=jnp.array([2.0, 3.0]), sparse_sizes=(2, 2))
    B = SparseTensor(row=jnp.zeros(0, jnp.int32), col=jnp.zeros(0, jnp.int32),
                     value=jnp.zeros(0, jnp.float32), sparse_sizes=(2, 2),
                     is_sorted=True, trust_data=True)
    assert np.asarray(spspmm_diag(A, B)).tolist() == [0.0, 0.0]
    assert np.asarray(spspmm_diag(B, A)).tolist() == [0.0, 0.0]
    assert np.asarray(spspmm_diag(B, B)).tolist() == [0.0, 0.0]


def test_block_spgemm_matches_dense_oracle():
    """Device block SpGEMM (ops/kernels/block_spgemm.py): the windowed
    MXU pair products reproduce the dense product of the block parts."""
    import jax.numpy as jnp

    from pytorch_sparse_tpu.ops.kernels.block_spgemm import (
        block_spgemm_plan, block_spgemm_stream,
    )

    rng = np.random.RandomState(0)
    Bb, nb_grid = 16, 6
    M = Bb * nb_grid
    # random block-sparse matrices
    def mk(p, seed):
        r = np.random.RandomState(seed)
        occ = r.rand(nb_grid, nb_grid) < p
        sr, sc = np.nonzero(occ)
        blocks = r.randn(sr.size, Bb, Bb).astype(np.float32)
        dense = np.zeros((M, M), np.float32)
        for t in range(sr.size):
            dense[sr[t]*Bb:(sr[t]+1)*Bb, sc[t]*Bb:(sc[t]+1)*Bb] = blocks[t]
        return jnp.asarray(blocks), sr.astype(np.int64), sc.astype(np.int64), dense

    blkA, srA, scA, dA = mk(0.4, 1)
    blkB, srB, scB, dB = mk(0.5, 2)
    want = dA @ dB
    got = np.zeros((M, M), np.float32)
    for rows, cols, cblk in block_spgemm_stream(
            blkA, srA, scA, blkB, srB, scB, max_out_blocks=3):
        cb = np.asarray(cblk)
        for t in range(rows.size):
            got[rows[t]*Bb:(rows[t]+1)*Bb,
                cols[t]*Bb:(cols[t]+1)*Bb] += cb[t]
    assert np.allclose(got, want, atol=1e-3)
    # plan sanity: every pair matches on the inner block index
    a_idx, b_idx, seg, orow, ocol = block_spgemm_plan(srA, scA, srB, scB)
    assert np.array_equal(scA[a_idx], srB[b_idx])
    assert np.array_equal(orow[seg], srA[a_idx])
    assert np.array_equal(ocol[seg], scB[b_idx])


def test_spspmm_stream_device_matches_dense_oracle():
    """spspmm_stream_device: device D@D blocks + host cross-term COO
    pieces SUM to the exact product (term partition is exact)."""
    import jax.numpy as jnp

    from pytorch_sparse_tpu.ops.spgemm import spspmm_stream_device
    from pytorch_sparse_tpu.testing import community_graph

    rng = np.random.RandomState(5)
    M = 256
    A = community_graph(M, 12000, 8, intra_p=0.85, rng=rng)
    B = community_graph(M, 9000, 8, intra_p=0.85,
                        rng=np.random.RandomState(6))
    dA = np.zeros((M, M), np.float32)
    np.add.at(dA, (np.asarray(A.storage.numpy_view("row")),
                   np.asarray(A.storage.numpy_view("col"))),
              np.asarray(A.storage.value()))
    dB = np.zeros((M, M), np.float32)
    np.add.at(dB, (np.asarray(B.storage.numpy_view("row")),
                   np.asarray(B.storage.numpy_view("col"))),
              np.asarray(B.storage.value()))
    want = dA @ dB

    for Bb, mind, bdt in [(32, 0.05, None), (16, 0.02, None),
                          (32, 0.05, jnp.bfloat16)]:
        got = np.zeros((M, M), np.float32)
        n_blocks = n_coo = 0
        for piece in spspmm_stream_device(A, B, Bb=Bb,
                                          min_density=mind,
                                          max_out_blocks=7,
                                          block_dtype=bdt):
            if piece[0] == "blocks":
                _, rows, cols, cblk = piece
                cb = np.asarray(cblk)
                for t in range(rows.size):
                    got[rows[t]*Bb:(rows[t]+1)*Bb,
                        cols[t]*Bb:(cols[t]+1)*Bb] += cb[t]
                n_blocks += rows.size
            else:
                _, lo, hi, blk = piece
                r = np.asarray(blk.storage.numpy_view("row")) + lo
                c = np.asarray(blk.storage.numpy_view("col"))
                v = blk.storage.value()
                np.add.at(got, (r, c),
                          1.0 if v is None else np.asarray(v))
                n_coo += blk.nnz()
        assert n_blocks > 0, "community graph must produce device blocks"
        tol = 2e-2 if bdt is None else 0.02 * float(np.abs(want).max())
        assert np.allclose(got, want, atol=tol), (
            f"Bb={Bb} dtype={bdt}: max err {np.abs(got - want).max():.2e}"
        )


def test_spspmm_stream_raw_matches_wrapped():
    """raw=True host triples carry exactly the wrapped blocks' data."""
    from pytorch_sparse_tpu.ops.spgemm import spspmm_stream

    rng = np.random.RandomState(9)
    M = 120
    A = SparseTensor(
        row=rng.randint(0, M, 2000), col=rng.randint(0, M, 2000),
        value=jnp.asarray(rng.randn(2000).astype(np.float32)),
        sparse_sizes=(M, M),
    ).coalesce("add")
    got = list(spspmm_stream(A, A, max_terms=5000, raw=True))
    want = list(spspmm_stream(A, A, max_terms=5000))
    assert len(got) == len(want)
    for (lo, hi, (rp, cc, vv)), (lo2, hi2, blk) in zip(got, want):
        assert (lo, hi) == (lo2, hi2)
        assert isinstance(rp, np.ndarray)
        r2, c2, v2 = blk.coo()
        assert np.array_equal(cc.astype(np.int64),
                              np.asarray(c2).astype(np.int64))
        assert np.allclose(vv, np.asarray(v2), atol=1e-6)
        assert np.array_equal(np.diff(rp.astype(np.int64)),
                              np.bincount(np.asarray(r2),
                                          minlength=hi - lo))
