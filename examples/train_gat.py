"""GAT training on a synthetic citation-style graph.

The attention layer is entirely scatter-free on TPU: per-edge logits via
gathers, bucketed edge softmax, per-head ELL SpMM with the transpose-ELL
backward (models/gat.py) — no segment scatters anywhere in the step.

    python examples/train_gat.py
    JAX_PLATFORMS=cpu python examples/train_gat.py --nodes 500
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
from pytorch_sparse_tpu.models import GAT


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=2708)
    ap.add_argument("--edges", type=int, default=10556)
    ap.add_argument("--features", type=int, default=256)
    ap.add_argument("--hidden", type=int, default=64)
    ap.add_argument("--classes", type=int, default=7)
    ap.add_argument("--heads", type=int, default=4)
    ap.add_argument("--epochs", type=int, default=30)
    args = ap.parse_args()

    rng = np.random.RandomState(0)
    M, E = args.nodes, args.edges
    adj = ts.SparseTensor(
        row=rng.randint(0, M, E), col=rng.randint(0, M, E),
        sparse_sizes=(M, M),
    ).coalesce("add").set_diag()  # self-loops, GAT convention
    adj.storage.ell()
    adj.storage.ell_t()

    x = jnp.asarray(rng.randn(M, args.features).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, args.classes, M).astype(np.int32))

    params = GAT.init(jax.random.PRNGKey(0), args.features, args.hidden,
                      args.classes, heads=args.heads)
    optimizer = optax.adam(5e-3)
    opt_state = optimizer.init(params)

    def loss_fn(params, adj, x, labels):
        logits = GAT.apply(params, adj, x)
        logp = jax.nn.log_softmax(logits, axis=-1)
        return -jnp.take_along_axis(logp, labels[:, None], axis=-1).mean()

    @jax.jit
    def step(params, opt_state, adj, x, labels):
        loss, grads = jax.value_and_grad(loss_fn)(params, adj, x, labels)
        updates, opt_state = optimizer.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    t_first = None
    for epoch in range(args.epochs):
        t0 = time.time()
        params, opt_state, loss = step(params, opt_state, adj, x, labels)
        loss = float(loss)
        if t_first is None:
            t_first = time.time() - t0
        if epoch % 10 == 0 or epoch == args.epochs - 1:
            print(f"epoch {epoch}: loss={loss:.4f}")
    logits = GAT.apply(params, adj, x)
    acc = float(jnp.mean(jnp.argmax(logits, -1) == labels))
    print(f"train accuracy: {acc:.3f} (first step incl. compile: "
          f"{t_first:.1f}s)")


if __name__ == "__main__":
    main()
