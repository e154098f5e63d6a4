"""Cluster-GCN training: METIS partitions as mini-batches.

The ogbn-products recipe (BASELINE.json config #4): partition the graph
k-way with the native multilevel partitioner, train on the induced
diagonal blocks — each step touches one cluster's rows/cols only, so
arbitrarily large graphs train on one chip with fixed-size compiled
steps.  This is what the reference's ``partition``/``partptr``/``perm``
output exists for (``torch_sparse/metis.py:24-75``: the hook PyG's
ClusterGCN loader builds on) — here the whole loop is in-framework.

Blocks are padded to the largest cluster size so every step reuses ONE
compiled program (XLA static shapes; re-tracing per cluster would cost
a compile each).

    python examples/train_cluster_gcn.py                 # any device
    JAX_PLATFORMS=cpu python examples/train_cluster_gcn.py --nodes 2000
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

import pytorch_sparse_tpu as ts
from pytorch_sparse_tpu.models import GCN, gcn_norm


def synthetic_community_graph(M, E, F, C, n_comm, seed=0):
    """Planted communities => partitions with low cut (the regime
    Cluster-GCN assumes)."""
    rng = np.random.RandomState(seed)
    comm = rng.randint(0, n_comm, M)
    order = np.argsort(comm)
    ptr = np.searchsorted(comm[order], np.arange(n_comm + 1))
    src = rng.randint(0, M, E)
    intra = rng.rand(E) < 0.85
    c = comm[src[intra]]
    dst = rng.randint(0, M, E)
    dst[intra] = order[
        ptr[c] + (rng.rand(int(intra.sum())) * (ptr[c + 1] - ptr[c])).astype(int)
    ]
    adj = ts.SparseTensor(row=src, col=dst, sparse_sizes=(M, M)).coalesce("add")
    x = rng.randn(M, F).astype(np.float32)
    labels = rng.randint(0, C, M).astype(np.int32)
    return adj, x, labels


def cluster_batches(adj, x, labels, num_parts):
    """Partition, then cut the diagonal blocks + per-cluster features.

    Returns fixed-shape padded batches: (ell-ready SparseTensor of the
    largest block size, features, labels, valid-row mask).
    """
    padj, partptr, perm = adj.partition(num_parts)
    perm_np = np.asarray(perm)
    pp = np.asarray(partptr)
    x_p, labels_p = x[perm_np], labels[perm_np]

    sizes = np.diff(pp)
    B = int(sizes.max())
    batches = []
    for p in range(num_parts):
        lo, hi = int(pp[p]), int(pp[p + 1])
        blk = padj.narrow(0, lo, hi - lo).narrow(1, lo, hi - lo)
        # pad to the common size B so one compiled step serves all parts
        blk = blk.sparse_resize((B, B))
        blk = gcn_norm(blk)
        blk.storage.ell()
        blk.storage.ell_t()
        xb = np.zeros((B, x.shape[1]), np.float32)
        xb[: hi - lo] = x_p[lo:hi]
        yb = np.zeros((B,), np.int32)
        yb[: hi - lo] = labels_p[lo:hi]
        mask = np.zeros((B,), bool)
        mask[: hi - lo] = True
        batches.append((blk, jnp.asarray(xb), jnp.asarray(yb),
                        jnp.asarray(mask)))
    return batches


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=20000)
    ap.add_argument("--edges", type=int, default=200000)
    ap.add_argument("--features", type=int, default=64)
    ap.add_argument("--hidden", type=int, default=128)
    ap.add_argument("--classes", type=int, default=16)
    ap.add_argument("--parts", type=int, default=8)
    ap.add_argument("--epochs", type=int, default=5)
    args = ap.parse_args()

    adj, x, labels = synthetic_community_graph(
        args.nodes, args.edges, args.features, args.classes,
        n_comm=args.parts * 4,
    )
    t0 = time.time()
    batches = cluster_batches(adj, x, labels, args.parts)
    print(f"partition + batch build: {time.time() - t0:.2f}s "
          f"({len(batches)} clusters, block size "
          f"{batches[0][1].shape[0]})")

    params = GCN.init(jax.random.PRNGKey(0), args.features, args.hidden,
                      args.classes)
    optimizer = optax.adam(1e-2)
    opt_state = optimizer.init(params)

    @jax.jit
    def step(params, opt_state, blk, xb, yb, mask):
        loss, grads = jax.value_and_grad(GCN.loss)(params, blk, xb, yb, mask)
        updates, opt_state = optimizer.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    for epoch in range(args.epochs):
        t0 = time.time()
        tot = 0.0
        for blk, xb, yb, mask in batches:
            params, opt_state, loss = step(params, opt_state, blk, xb, yb,
                                           mask)
            tot += float(loss)
        print(f"epoch {epoch}: loss {tot / len(batches):.4f} "
              f"({time.time() - t0:.2f}s, {len(batches)} cluster steps)")

    # full-graph eval with the cluster-trained params
    full = gcn_norm(adj)
    full.storage.ell()
    full.storage.ell_t()
    logits = GCN.apply(params, full, jnp.asarray(x))
    acc = float(jnp.mean((jnp.argmax(logits, -1) == jnp.asarray(labels))))
    print(f"full-graph train accuracy: {acc:.3f}")


if __name__ == "__main__":
    main()
