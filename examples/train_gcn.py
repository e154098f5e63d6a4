"""End-to-end GCN training on a synthetic Cora-scale graph.

Runs on whatever device JAX finds (real TPU, or
``JAX_PLATFORMS=cpu`` for local runs); add ``--distributed`` to train
the row-partitioned DistGCN over all available devices.

    python examples/train_gcn.py
    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/train_gcn.py --distributed
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


def synthetic_graph(M, E, F, C, seed=0):
    rng = np.random.RandomState(seed)
    adj = gcn_norm(
        ts.SparseTensor(
            row=jnp.asarray(rng.randint(0, M, E).astype(np.int32)),
            col=jnp.asarray(rng.randint(0, M, E).astype(np.int32)),
            sparse_sizes=(M, M),
        ).coalesce("add")
    )
    x = jnp.asarray(rng.randn(M, F).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, C, M).astype(np.int32))
    return adj, x, labels


def train_single(args):
    adj, x, labels = synthetic_graph(args.nodes, args.edges, args.features,
                                     args.classes)
    adj.storage.ell()
    adj.storage.ell_t()
    params = GCN.init(jax.random.PRNGKey(0), args.features, args.hidden,
                      args.classes)
    optimizer = optax.adam(1e-2)
    opt_state = optimizer.init(params)

    @jax.jit
    def step(params, opt_state, adj, x, labels):
        loss, grads = jax.value_and_grad(GCN.loss)(params, adj, x, labels)
        updates, opt_state = optimizer.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    loss = None
    t0 = None
    for epoch in range(args.epochs):
        params, opt_state, loss = step(params, opt_state, adj, x, labels)
        if epoch == 0:
            loss.block_until_ready()
            t0 = time.perf_counter()  # exclude compile
    loss.block_until_ready()
    dt = (time.perf_counter() - t0) / max(args.epochs - 1, 1)
    logits = GCN.apply(params, adj, x)
    acc = float((jnp.argmax(logits, -1) == labels).mean())
    print(f"single-device: final loss={float(loss):.4f} "
          f"train-acc={acc:.3f}  ~{dt*1e3:.2f} ms/step (host-timed)")


def train_distributed(args):
    from pytorch_sparse_tpu.models import DistGCN
    from pytorch_sparse_tpu.parallel import (
        HierShardedSparseMatrix, ShardedSparseMatrix, make_mesh,
        make_mesh_hier,
    )

    adj, x, labels = synthetic_graph(args.nodes, args.edges, args.features,
                                     args.classes)
    if args.slices > 1:
        # Hierarchical (DCN x ICI) layout: intra-slice halos on ICI,
        # slice-deduped unions on DCN (parallel/hier.py).
        n = len(jax.devices())
        mesh = make_mesh_hier(args.slices, n // args.slices)
        Ash = HierShardedSparseMatrix.from_sparse_tensor(adj, mesh)
    else:
        mesh = make_mesh()
        Ash = ShardedSparseMatrix.from_sparse_tensor(adj, mesh)
    xs = Ash.shard_dense(x)
    n_pad = Ash.P * Ash.Nb
    lab = np.zeros((n_pad,), np.int32)
    lab[: args.nodes] = np.asarray(labels)
    msk = np.zeros((n_pad,), np.float32)
    msk[: args.nodes] = 1.0
    labels_s = Ash.shard_dense(jnp.asarray(lab)[:, None])[..., 0]
    mask_s = Ash.shard_dense(jnp.asarray(msk)[:, None])[..., 0]

    params = DistGCN.init(jax.random.PRNGKey(0), args.features, args.hidden,
                          args.classes)
    optimizer = optax.adam(1e-2)
    opt_state = optimizer.init(params)

    @jax.jit
    def step(params, opt_state, Ash, xs, labels_s, mask_s):
        return DistGCN.train_step(params, opt_state, Ash, xs, labels_s,
                                  mask_s, optimizer)

    loss = None
    for _ in range(args.epochs):
        params, opt_state, loss = step(params, opt_state, Ash, xs,
                                       labels_s, mask_s)
    print(f"distributed ({mesh.devices.size} devices): "
          f"final loss={float(loss):.4f}")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--nodes", type=int, default=2708)
    p.add_argument("--edges", type=int, default=10556)
    p.add_argument("--features", type=int, default=1433)
    p.add_argument("--hidden", type=int, default=16)
    p.add_argument("--classes", type=int, default=7)
    p.add_argument("--epochs", type=int, default=50)
    p.add_argument("--distributed", action="store_true")
    p.add_argument("--slices", type=int, default=1,
                   help="with --distributed: split the mesh into this "
                        "many DCN-connected slices (hierarchical "
                        "schedule, parallel/hier.py)")
    args = p.parse_args()
    (train_distributed if args.distributed else train_single)(args)
