"""Port of reference ``test/test_metis.py`` (partition smoke matrix) plus
partition-quality sanity."""

from itertools import product

import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from pytorch_sparse_tpu import SparseTensor


@pytest.mark.parametrize("weighted", [False, True])
def test_metis(weighted):
    rng = np.random.RandomState(0)
    mat1 = jnp.asarray(rng.randn(6, 6), jnp.float32)
    mat2 = jnp.arange(36, dtype=jnp.float32).reshape(6, 6)
    mat3 = jnp.ones((6, 6), jnp.float32)

    vec1 = None
    vec2 = jnp.asarray(rng.rand(6), jnp.float32)

    for mat, vec in product([mat1, mat2, mat3], [vec1, vec2]):
        sp = SparseTensor.from_dense(mat)

        _, partptr, perm = sp.partition(
            num_parts=1, recursive=False, weighted=weighted, node_weight=vec
        )
        assert partptr.shape[0] == 2
        assert perm.shape[0] == 6

        _, partptr, perm = sp.partition(
            num_parts=2, recursive=False, weighted=weighted, node_weight=vec
        )
        assert partptr.shape[0] == 3
        assert perm.shape[0] == 6


def test_partition_locality():
    """Two disconnected cliques must be split apart by a 2-way partition."""
    blocks = []
    for off in (0, 8):
        for i in range(8):
            for j in range(8):
                if i != j:
                    blocks.append((off + i, off + j))
    row = jnp.asarray(np.array([e[0] for e in blocks], np.int32))
    col = jnp.asarray(np.array([e[1] for e in blocks], np.int32))
    adj = SparseTensor(row=row, col=col, sparse_sizes=(16, 16))

    out, partptr, perm = adj.partition(num_parts=2)
    assert partptr.tolist() == [0, 8, 16]
    groups = [sorted(np.asarray(perm[:8]).tolist()),
              sorted(np.asarray(perm[8:]).tolist())]
    assert sorted(map(tuple, groups)) == [tuple(range(8)),
                                          tuple(range(8, 16))]

    # permuted adjacency must be block-diagonal: no cross-part edges
    r, c, _ = out.coo()
    assert not bool(((r < 8) & (c >= 8)).any())
    assert not bool(((r >= 8) & (c < 8)).any())


def test_multilevel_recovers_planted_partition():
    """Stochastic-block-model quality check: the multilevel partitioner
    must find a cut close to the planted one (RCM chunking gets ~27%)."""
    import numpy as np
    import pytest

    from pytorch_sparse_tpu.csrc import bindings

    if not bindings.available():
        pytest.skip("native library not built")

    rng = np.random.RandomState(0)
    B, NB = 4, 1000
    N = B * NB
    rows, cols = [], []
    for b in range(B):
        base = b * NB
        rows.append(rng.randint(0, NB, 12_000) + base)
        cols.append(rng.randint(0, NB, 12_000) + base)
    rows.append(rng.randint(0, N, 2_400))
    cols.append(rng.randint(0, N, 2_400))
    row = np.concatenate(rows)
    col = np.concatenate(cols)
    row, col = np.concatenate([row, col]), np.concatenate([col, row])
    order = np.lexsort((col, row))
    row, col = row[order], col[order]
    rowptr = np.zeros(N + 1, np.int64)
    np.add.at(rowptr, row + 1, 1)
    rowptr = np.cumsum(rowptr)

    cluster, cut = bindings.multilevel_partition(rowptr, col, B)
    frac = cut / (row.shape[0] // 2)
    assert frac < 0.10, f"cut fraction {frac:.3f} too high"
    sizes = np.bincount(cluster, minlength=B)
    assert sizes.min() > 0.7 * NB, sizes


def test_weighted_partition_respects_edge_weights():
    # Four 10-node blobs with unit intra-blob cliques. Heavy bridges
    # (weight 100) join blob0<->blob1 and blob2<->blob3; light bridges
    # (weight 1, same count) join blob0<->blob2 and blob1<->blob3.
    # weighted=True must keep the heavy pairs together (reference
    # metis.py:46-50 adjwgt semantics).
    import numpy as np

    B = 10
    rows, cols, vals = [], [], []

    def clique(base, w):
        for i in range(B):
            for j in range(B):
                if i != j:
                    rows.append(base + i)
                    cols.append(base + j)
                    vals.append(w)

    def bridge(a, b, w, k=20):
        rng = np.random.RandomState(a * 7 + b)
        for _ in range(k):
            i, j = rng.randint(0, B, 2)
            rows.extend([a + i, b + j])
            cols.extend([b + j, a + i])
            vals.extend([w, w])

    for base in (0, 10, 20, 30):
        clique(base, 1.0)
    bridge(0, 10, 100.0)
    bridge(20, 30, 100.0)
    bridge(0, 20, 1.0)
    bridge(10, 30, 1.0)

    A = SparseTensor(
        row=np.asarray(rows), col=np.asarray(cols),
        value=jnp.asarray(np.asarray(vals, np.float32)),
        sparse_sizes=(4 * B, 4 * B),
    ).coalesce("add")

    _, partptr, perm = A.partition(2, weighted=True)
    cluster = np.empty(4 * B, np.int64)
    pp = np.asarray(partptr)
    perm_np = np.asarray(perm)
    for p in range(2):
        cluster[perm_np[pp[p]:pp[p + 1]]] = p
    blob = lambda k: cluster[k * B:(k + 1) * B]
    # heavy pairs end up together
    assert len(set(blob(0)) | set(blob(1))) == 1
    assert len(set(blob(2)) | set(blob(3))) == 1
    assert blob(0)[0] != blob(2)[0]


def test_mt_partition_threaded_stress():
    """mt_partition with a real OpenMP team (threads > cores is fine).

    Exercises the CAS heavy-edge matcher under genuine concurrency: a
    node claimed by a neighbor and then RELEASED (the claimer upgraded
    to a heavier match) must be re-self-matched before coarsening, or
    the cmap pass writes out of bounds (native.cpp matcher cleanup).
    Repeats over seeds/shapes to vary interleavings; asserts the
    partition stays valid and balanced every time."""
    import numpy as np

    from pytorch_sparse_tpu.csrc import bindings

    if not bindings.available():
        pytest.skip("native library not built")

    rng = np.random.RandomState(11)
    for trial in range(4):
        B, NB = 4, 800
        N = B * NB
        rows, cols = [], []
        for b in range(B):
            base = b * NB
            rows.append(rng.randint(0, NB, 9_000) + base)
            cols.append(rng.randint(0, NB, 9_000) + base)
        rows.append(rng.randint(0, N, 1_800))
        cols.append(rng.randint(0, N, 1_800))
        row = np.concatenate(rows)
        col = np.concatenate(cols)
        row, col = np.concatenate([row, col]), np.concatenate([col, row])
        order = np.lexsort((col, row))
        row, col = row[order], col[order]
        # weighted edges make upgrades (claim -> release -> re-claim)
        # frequent in the matcher
        ew = rng.randint(1, 50, row.shape[0]).astype(np.int64)
        rowptr = np.zeros(N + 1, np.int64)
        np.add.at(rowptr, row + 1, 1)
        rowptr = np.cumsum(rowptr)

        cluster, cut = bindings.multilevel_partition(
            rowptr, col, B, edge_weight=ew, seed=trial + 1, num_workers=8
        )
        assert cluster.shape[0] == N
        assert cluster.min() >= 0 and cluster.max() < B
        sizes = np.bincount(cluster, minlength=B)
        assert sizes.min() > 0.5 * NB, sizes


def test_partition_fine_contract_and_contiguity():
    """Two-level partition (ts.partition_fine): same (padj, partptr,
    perm) contract as partition(), communities far smaller than a
    coarse part become contiguous (dense-block coverage rises vs the
    direct coarse partition), and the quotient grouping keeps the
    coarse cut near the direct partition's."""
    import jax.numpy as jnp

    import pytorch_sparse_tpu as ts
    from pytorch_sparse_tpu.ops.kernels.hybrid import dense_fraction

    rng = np.random.RandomState(3)
    M, n_comm = 4096, 64
    comm = rng.randint(0, n_comm, M).astype(np.int64)  # scattered ids
    # dense intra-community edges + sparse background
    src = rng.randint(0, M, 120_000)
    intra = rng.rand(src.size) < 0.85
    by_comm = [np.flatnonzero(comm == c) for c in range(n_comm)]
    dst = rng.randint(0, M, src.size)
    for c in range(n_comm):
        sel = intra & (comm[src] == c)
        dst[sel] = by_comm[c][rng.randint(0, by_comm[c].size, int(sel.sum()))]
    A = ts.SparseTensor(
        row=jnp.asarray(src.astype(np.int64)),
        col=jnp.asarray(dst.astype(np.int64)),
        sparse_sizes=(M, M),
    ).coalesce("add")

    def cut_frac(padj, pp):
        r = np.asarray(padj.storage.numpy_view("row"))
        c = np.asarray(padj.storage.numpy_view("col"))
        part = np.searchsorted(pp, np.arange(M), side="right") - 1
        return float((part[r] != part[c]).sum()) / r.size

    pad4, pp4, perm4 = ts.partition(A, 4)
    padf, ppf, permf = ts.partition_fine(A, 4, fine_parts=n_comm)
    ppf_np = np.asarray(ppf)
    # contract: partptr covers [0, M], perm is a permutation
    assert ppf_np[0] == 0 and ppf_np[-1] == M
    assert (np.diff(ppf_np) > 0).all()
    permf_np = np.asarray(permf)
    assert np.array_equal(np.sort(permf_np), np.arange(M))
    # the permuted adjacency IS the relabel of the original
    inv = np.empty(M, np.int64)
    inv[permf_np] = np.arange(M)
    want_r, want_c = inv[src], inv[dst]
    got_r = np.asarray(padf.storage.numpy_view("row"))
    got_c = np.asarray(padf.storage.numpy_view("col"))
    a = np.sort(got_r.astype(np.int64) * M + got_c)
    b = np.unique(want_r.astype(np.int64) * M + want_c)
    assert np.array_equal(a, b)
    # contiguity: dense-block edge coverage rises vs direct coarse
    B = 64
    frac4, _ = dense_fraction(
        np.asarray(pad4.storage.numpy_view("row")),
        np.asarray(pad4.storage.numpy_view("col")), M, M, B=B,
        min_density=0.02)
    fracf, _ = dense_fraction(got_r, got_c, M, M, B=B, min_density=0.02)
    assert fracf > frac4 + 0.1, (fracf, frac4)
    # quotient grouping keeps the coarse cut within 1.5x of direct
    assert cut_frac(padf, ppf_np) < 1.5 * cut_frac(pad4, np.asarray(pp4)) + 0.05


def test_partition_fine_weighted_passthrough():
    """Advisor r4: partition_fine forwards ``weighted``/``node_weight``
    to the fine level (adjwgt parity with plain partition()) and
    aggregates them at the quotient level (crossing-VALUE edge weights,
    per-cluster node-weight sums).  Contract must hold in every
    combination."""
    import pytorch_sparse_tpu as ts

    rng = np.random.RandomState(11)
    M, n_comm = 512, 16
    comm = rng.randint(0, n_comm, M)
    src = rng.randint(0, M, 8000)
    dst = rng.randint(0, M, 8000)
    intra = rng.rand(8000) < 0.8
    by_comm = [np.flatnonzero(comm == c) for c in range(n_comm)]
    for c in range(n_comm):
        sel = intra & (comm[src] == c)
        if by_comm[c].size:
            dst[sel] = by_comm[c][
                rng.randint(0, by_comm[c].size, int(sel.sum()))]
    val = rng.rand(8000).astype(np.float32) + 0.1
    A = ts.SparseTensor(
        row=jnp.asarray(src.astype(np.int64)),
        col=jnp.asarray(dst.astype(np.int64)),
        value=jnp.asarray(val), sparse_sizes=(M, M),
    ).coalesce("add")
    nw = jnp.asarray(rng.rand(M).astype(np.float32) + 0.5)

    for weighted, node_w in [(True, None), (False, nw), (True, nw)]:
        padj, pp, perm = ts.partition_fine(
            A, 4, fine_parts=n_comm, weighted=weighted, node_weight=node_w
        )
        pp_np, perm_np = np.asarray(pp), np.asarray(perm)
        assert pp_np[0] == 0 and pp_np[-1] == M
        assert (np.diff(pp_np) >= 0).all()
        assert np.array_equal(np.sort(perm_np), np.arange(M))
        # permuted adjacency is the exact relabel of the original
        inv = np.empty(M, np.int64)
        inv[perm_np] = np.arange(M)
        r = np.asarray(padj.storage.numpy_view("row"))
        c = np.asarray(padj.storage.numpy_view("col"))
        got = np.sort(r.astype(np.int64) * M + c)
        Ar = np.asarray(A.storage.numpy_view("row"))
        Ac = np.asarray(A.storage.numpy_view("col"))
        want = np.sort(inv[Ar].astype(np.int64) * M + inv[Ac])
        assert np.array_equal(got, want)
        # node_weight balance: per-part weight sums within 30% of even
        if node_w is not None:
            part = np.searchsorted(pp_np, np.arange(M), side="right") - 1
            w = np.asarray(nw)[perm_np]
            psums = np.bincount(part, weights=w, minlength=4)
            assert psums.max() <= 1.6 * psums.mean()


def test_partition_fine_within_grouping():
    """grouping="within": coarse cut IDENTICAL to the direct partition
    (same partptr), per-part interiors reordered so scattered
    communities become contiguous (dense coverage rises), contract
    preserved."""
    import pytorch_sparse_tpu as ts
    from pytorch_sparse_tpu.ops.kernels.hybrid import dense_fraction

    rng = np.random.RandomState(5)
    M, n_comm = 4096, 64
    comm = rng.randint(0, n_comm, M)
    src = rng.randint(0, M, 100_000)
    dst = rng.randint(0, M, 100_000)
    intra = rng.rand(src.size) < 0.85
    byc = [np.flatnonzero(comm == c) for c in range(n_comm)]
    for c in range(n_comm):
        sel = intra & (comm[src] == c)
        if byc[c].size:
            dst[sel] = byc[c][rng.randint(0, byc[c].size, int(sel.sum()))]
    A = ts.SparseTensor(
        row=jnp.asarray(src.astype(np.int64)),
        col=jnp.asarray(dst.astype(np.int64)), sparse_sizes=(M, M),
    ).coalesce("add")

    pad0, pp0, _ = ts.partition(A, 4)
    padw, ppw, permw = ts.partition_fine(A, 4, fine_parts=n_comm,
                                         fine_method="coarsen",
                                         grouping="within")
    # same coarse structure: identical partptr and identical cut
    assert np.array_equal(np.asarray(pp0), np.asarray(ppw))

    def cut(p, pp):
        r = np.asarray(p.storage.numpy_view("row"))
        c = np.asarray(p.storage.numpy_view("col"))
        part = np.searchsorted(np.asarray(pp), np.arange(M),
                               side="right") - 1
        return float((part[r] != part[c]).mean())

    assert abs(cut(pad0, pp0) - cut(padw, ppw)) < 1e-12
    # contract: perm is a permutation, padw is the relabel of A
    pw = np.asarray(permw)
    assert np.array_equal(np.sort(pw), np.arange(M))
    inv = np.empty(M, np.int64)
    inv[pw] = np.arange(M)
    r = np.asarray(padw.storage.numpy_view("row"))
    c = np.asarray(padw.storage.numpy_view("col"))
    Ar = np.asarray(A.storage.numpy_view("row"))
    Ac = np.asarray(A.storage.numpy_view("col"))
    assert np.array_equal(
        np.sort(r.astype(np.int64) * M + c),
        np.sort(inv[Ar].astype(np.int64) * M + inv[Ac]),
    )
    # contiguity: within-reorder beats the direct partition's coverage
    B = 64
    f0, _ = dense_fraction(
        np.asarray(pad0.storage.numpy_view("row")),
        np.asarray(pad0.storage.numpy_view("col")), M, M, B=B,
        min_density=0.02)
    fw, _ = dense_fraction(r, c, M, M, B=B, min_density=0.02)
    assert fw > f0 + 0.1, (fw, f0)
