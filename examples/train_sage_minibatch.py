"""Mini-batch GraphSAGE training: the sampler -> padded-batch -> jit
pipeline (the production pattern the reference's ``sample_adj`` exists
for, ``torch_sparse/sample.py:27-43``).

Per batch, ``sample_adj`` draws one bipartite adjacency per hop on the
host (native C++ kernel), then everything is padded to static shapes so
a single compiled train step serves every batch: node lists pad to a
fixed width, edge lists pad onto a scratch target row that is sliced
off, so ``mean`` aggregation sees exact degrees.

``--workers N`` overlaps sampling with the device step through
``MinibatchPrefetcher`` (the multi-worker-DataLoader equivalent: ctypes
sampler calls release the GIL, so worker threads scale with host
cores; batch order and all sampling seeds are derived from the batch
index, so results are identical at any worker count).

    python examples/train_sage_minibatch.py            # real TPU
    python examples/train_sage_minibatch.py --workers 4
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
from pytorch_sparse_tpu.models import GraphSAGE


def pad_batch(adjs_nids, batch_size, fanouts):
    """Pad per-hop bipartite adjacencies and the feature gather to the
    static shapes implied by (batch_size, fanouts)."""
    padded = []
    n_caps = [batch_size]
    for k in fanouts:
        n_caps.append(n_caps[-1] * (k + 1))
    # innermost hop first in adjs_nids: [(adj_hopL, n_id_hopL), ...]
    for h, (adj, n_id) in enumerate(adjs_nids):
        n_tgt_cap, n_src_cap = n_caps[h], n_caps[h + 1]
        # Stay in numpy: batch shapes vary, and eager jax ops would
        # recompile per shape.
        rowptr = np.asarray(adj.storage.rowptr(), np.int64)
        col = np.asarray(adj.storage.col(), np.int64)
        row = np.repeat(np.arange(rowptr.shape[0] - 1), np.diff(rowptr))
        E_cap = n_tgt_cap * fanouts[h]
        E = int(col.shape[0])
        row_np = np.full(E_cap, n_tgt_cap, np.int32)   # scratch row
        col_np = np.zeros(E_cap, np.int32)
        row_np[:E] = row
        col_np[:E] = col
        nid_np = np.zeros(n_src_cap, np.int64)
        nid_np[: n_id.shape[0]] = np.asarray(n_id)
        A = ts.SparseTensor(
            row=jnp.asarray(row_np), col=jnp.asarray(col_np),
            sparse_sizes=(n_tgt_cap + 1, n_src_cap),
            is_sorted=True, trust_data=True,
        )
        padded.append((A, jnp.asarray(nid_np)))
    return padded


def sage_bipartite_apply(params, padded, x_src):
    """Apply SAGE over bipartite hops (innermost last)."""
    x = x_src
    n = len(params["layers"])
    for i, layer in enumerate(params["layers"]):
        A, _ = padded[n - 1 - i]
        n_tgt = A.sparse_size(0) - 1  # drop the scratch row
        neigh = A.spmm(x, "mean")[:n_tgt]
        x = x[:n_tgt] @ layer["w_self"] + neigh @ layer["w_neigh"] + layer["b"]
        if i < n - 1:
            x = jax.nn.relu(x)
    return x


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--nodes", type=int, default=50_000)
    p.add_argument("--edges", type=int, default=400_000)
    p.add_argument("--features", type=int, default=128)
    p.add_argument("--hidden", type=int, default=64)
    p.add_argument("--classes", type=int, default=16)
    p.add_argument("--batch", type=int, default=512)
    p.add_argument("--fanouts", type=int, nargs="+", default=[10, 5])
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--workers", type=int, default=0,
                   help="prefetch worker threads (0 = synchronous)")
    args = p.parse_args()

    rng = np.random.RandomState(0)
    M, E = args.nodes, args.edges
    A = ts.SparseTensor(
        row=jnp.asarray(rng.randint(0, M, E).astype(np.int32)),
        col=jnp.asarray(rng.randint(0, M, E).astype(np.int32)),
        sparse_sizes=(M, M),
    ).coalesce("add")
    feats = rng.randn(M, args.features).astype(np.float32)
    labels = rng.randint(0, args.classes, M).astype(np.int32)

    params = GraphSAGE.init(
        jax.random.PRNGKey(0), args.features, args.hidden, args.classes,
        num_layers=len(args.fanouts),
    )
    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(params)

    @jax.jit
    def step(params, opt_state, batch):
        padded, x_src, y = batch

        def loss_fn(params):
            logits = sage_bipartite_apply(params, padded, x_src)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, y
            ).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state2 = optimizer.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state2, loss

    def make_batch(it):
        """All randomness keyed by the batch index: identical batches at
        any worker count (MinibatchPrefetcher's determinism contract)."""
        brng = np.random.RandomState(100_000 + it)
        targets = jnp.asarray(
            brng.choice(M, args.batch, replace=False).astype(np.int64)
        )
        # innermost hop first: hop h samples neighbors of hop h-1's nodes
        adjs_nids = []
        frontier = targets
        for h, k in enumerate(args.fanouts):
            adj, n_id = ts.sample_adj(A, frontier, k, replace=False,
                                      seed=1000 + it * 10 + h)
            adjs_nids.append((adj, n_id))
            frontier = n_id
        padded = pad_batch(adjs_nids, args.batch, args.fanouts)
        x_src = jnp.asarray(feats[np.asarray(padded[-1][1])])
        y = jnp.asarray(labels[np.asarray(targets)])
        return padded, x_src, y

    sample_ms = step_ms = 0.0
    loss = None
    if args.workers > 0:
        from pytorch_sparse_tpu.sample.loader import MinibatchPrefetcher

        # warm the compile outside the timed loop (params not updated, so
        # the run trains the same batch sequence as the sync path)
        _, _, warm = step(params, opt_state, make_batch(0))
        warm.block_until_ready()
        loader = MinibatchPrefetcher(
            make_batch, args.steps, num_workers=args.workers
        )
        t0 = time.perf_counter()
        for batch in loader:
            params, opt_state, loss = step(params, opt_state, batch)
        # block_until_ready does not block through the remote tunnel
        # (CLAUDE.md); the host transfer waits on the whole sequential
        # step chain, so it IS the honest end-to-end drain.
        loss_val = float(loss)
        wall = time.perf_counter() - t0
        print(
            f"minibatch SAGE (prefetch x{args.workers}): final "
            f"loss={loss_val:.4f}  {args.steps / wall:.2f} steps/s "
            f"end-to-end ({wall / args.steps * 1e3:.2f} ms/step, "
            f"batch={args.batch}, fanouts={args.fanouts})"
        )
        return

    t_start = time.perf_counter()
    for it in range(args.steps):
        t0 = time.perf_counter()
        batch = make_batch(it)
        t1 = time.perf_counter()
        params, opt_state, loss = step(params, opt_state, batch)
        # the host transfer is the only honest device sync through the
        # remote tunnel (block_until_ready returns early, CLAUDE.md)
        loss_val = float(loss)
        t2 = time.perf_counter()
        if it == 0:  # exclude compile from averages AND the wall clock
            t_start += t2 - t0
        else:
            sample_ms += (t1 - t0) * 1e3
            step_ms += (t2 - t1) * 1e3
    wall = time.perf_counter() - t_start
    n = max(args.steps - 1, 1)
    print(
        f"minibatch SAGE: final loss={loss_val:.4f}  "
        f"sample+pad {sample_ms/n:.2f} ms/batch, "
        f"train step {step_ms/n:.2f} ms/batch, "
        f"{n / wall:.2f} steps/s end-to-end "
        f"(batch={args.batch}, fanouts={args.fanouts})"
    )


if __name__ == "__main__":
    main()
