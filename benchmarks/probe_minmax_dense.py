"""Probe: can a blocked masked-extremum beat the ELL gather for min/max
on dense-community graphs?  (VERDICT r4 item 4.)

The sum route wins on such graphs because the MXU does the B*B*K
block flops essentially free; min/max cannot ride the MXU (it is a
(min, *) semiring), so the blocked formulation is VPU-bound:
``ext[i,k] = min_j where(mask[i,j], D[i,j] * x[j,k], big)`` costs
~3 VPU ops per (i,j,k) slot.  Whether that beats the per-edge gather
cost depends on the measured VPU fused mul+where+reduce rate and the
block density — this probe measures both sides on the real chip:

  * `ell_minmax_ms`   — the shipped ELL min/max path (gather-bound)
  * `blk_max_ms`      — masked-extremum over the occupied blocks only,
                        scan-chunked like the sum block pass
  * `blk_arg_ms`      — same including argout (argmin + eid
                        take_along_axis — the full contract cost)
  * implied total = blocks + remainder at the measured per-edge rate

Run:  python benchmarks/probe_minmax_dense.py --scale 0.1
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=float, default=0.1)
    ap.add_argument("--K", type=int, default=128)
    ap.add_argument("--B", type=int, default=512)
    ap.add_argument("--chunk", type=int, default=64,
                    help="blocks per scan step")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    import pytorch_sparse_tpu as ts
    from pytorch_sparse_tpu.testing import community_graph
    from timing import device_time

    report = {}
    rng = np.random.RandomState(0)
    M = int(232_965 * args.scale)
    E = int(114_615_892 * args.scale * 1.4)
    n_comm = max(int(300 * args.scale), 4)
    A = community_graph(M, E, n_comm, intra_p=0.9, rng=rng)
    padj, pptr, _ = A.partition(max(n_comm // 10, 4))
    report["nodes"], report["nnz"] = M, int(padj.nnz())
    x = jnp.asarray(rng.randn(M, args.K).astype(np.float32))

    # --- shipped ELL min/max
    padj.storage.ell()
    padj.storage.ell_t()
    dt = device_time(lambda m, a: ts.spmm_max(a, m)[0], x, padj)
    report["ell_minmax_ms"] = round(dt * 1e3, 2)
    report["ell_ns_per_edge"] = round(dt / padj.nnz() * 1e9, 2)
    print(json.dumps(report), flush=True)

    # --- block structure (host): occupied (B, B) blocks above a
    # minimum density so the comparison mirrors the sum router's split
    B = args.B
    row = np.asarray(padj.storage.numpy_view("row"))
    col = np.asarray(padj.storage.numpy_view("col"))
    val = np.asarray(padj.storage.value())
    nbr = -(-M // B)
    bid = (row // B).astype(np.int64) * nbr + col // B
    ub, cnt = np.unique(bid, return_counts=True)
    keep = cnt >= int(0.005 * B * B)  # ~sum-route break-even ballpark
    dense_blocks = ub[keep]
    in_dense = np.isin(bid, dense_blocks)
    report["blocks"] = int(dense_blocks.size)
    report["dense_edges"] = int(in_dense.sum())
    report["dense_frac"] = round(float(in_dense.mean()), 3)
    if dense_blocks.size == 0:
        print(json.dumps(report))
        return

    order = np.argsort(bid[in_dense], kind="stable")
    r_d = row[in_dense][order]
    c_d = col[in_dense][order]
    v_d = val[in_dense][order]
    b_d = bid[in_dense][order]
    slot = np.searchsorted(dense_blocks, b_d)
    nb = dense_blocks.size
    vblk = np.zeros((nb, B, B), np.float32)
    eblk = np.full((nb, B, B), -1, np.int32)
    li = (r_d % B).astype(np.int64)
    lj = (c_d % B).astype(np.int64)
    vblk[slot, li, lj] = v_d
    eblk[slot, li, lj] = np.arange(r_d.size, dtype=np.int32)  # probe ids
    srow = (dense_blocks // nbr).astype(np.int32)
    scol = (dense_blocks % nbr).astype(np.int32)
    vblk_j = jnp.asarray(vblk)
    eblk_j = jnp.asarray(eblk)
    srow_j, scol_j = jnp.asarray(srow), jnp.asarray(scol)
    # pad M to block multiple for x slices
    Mp = nbr * B
    xp = jnp.zeros((Mp, args.K), jnp.float32).at[:M].set(x)

    C = min(args.chunk, nb)
    nch = -(-nb // C)
    padn = nch * C - nb
    vb = jnp.concatenate([vblk_j, jnp.zeros((padn, B, B), jnp.float32)])
    eb = jnp.concatenate([eblk_j, jnp.full((padn, B, B), -1, jnp.int32)])
    sr = jnp.concatenate([srow_j, jnp.zeros((padn,), jnp.int32)])
    sc = jnp.concatenate([scol_j, jnp.zeros((padn,), jnp.int32)])
    vb = vb.reshape(nch, C, B, B)
    eb = eb.reshape(nch, C, B, B)
    sr = sr.reshape(nch, C)
    sc = sc.reshape(nch, C)
    big = jnp.float32(-3.4e38)

    # tables must be jit ARGUMENTS: closed over they become HLO
    # constants and the remote compile rejects the payload (HTTP 413 —
    # CLAUDE.md closure-vs-argument rule; first attempt hit exactly
    # this at ~45 min of buffering).
    def blk_max(xp, vb, eb, sr, sc, with_arg):
        xb = xp.reshape(nbr, B, args.K)

        def step(carry, t):
            out, argb = carry
            vbc, ebc, src_, scc = t
            xs = jnp.take(xb, scc, axis=0)               # (C, B, K)
            cand = vbc[:, :, :, None] * xs[:, None, :, :]  # (C,B,B,K)
            mask = (ebc >= 0)[:, :, :, None]
            cand = jnp.where(mask, cand, big)
            ext = cand.max(axis=2)                        # (C, B, K)
            # scatter-free per-row-block combine: segment over srow
            out = out.at[src_].max(ext)
            if with_arg:
                sl = cand.argmax(axis=2).astype(jnp.int32)  # (C,B,K)
                eid = jnp.take_along_axis(ebc, sl, axis=2)  # (C,B,K)
                # cost proxy for the tie-correct combine (same op count)
                argb = argb.at[src_].max(eid)
            return (out, argb), None

        out0 = jnp.full((nbr, B, args.K), big, jnp.float32)
        arg0 = jnp.full((nbr, B, args.K), -1, jnp.int32)
        (out, argb), _ = lax.scan(step, (out0, arg0), (vb, eb, sr, sc))
        return (out, argb) if with_arg else out

    for with_arg, key in ((False, "blk_max_ms"), (True, "blk_arg_ms")):
        init = jax.jit(
            lambda xq, v, e, r, c, wa=with_arg: blk_max(xq, v, e, r, c,
                                                        wa)
        )(xp, vb, eb, sr, sc)

        def timed(cr, xq, v, e, r, c, wa=with_arg):
            leaf = cr[0] if wa else cr  # consume carry (timing.py rule)
            return blk_max(xq + leaf[0, 0, 0].astype(xq.dtype) * 1e-30,
                           v, e, r, c, wa)

        dt = device_time(timed, init, xp, vb, eb, sr, sc)
        report[key] = round(dt * 1e3, 2)
        report[key.replace("_ms", "_ns_per_slot")] = round(
            dt / (nb * B * B * 1.0) * 1e9 * 1.0, 3
        )
        print(json.dumps(report), flush=True)
    rem_edges = int(padj.nnz() - in_dense.sum())
    implied = report.get("blk_arg_ms", 0) + rem_edges * report[
        "ell_ns_per_edge"] * 1e-6
    report["implied_hybrid_minmax_ms"] = round(implied, 2)
    report["speedup_vs_ell"] = round(
        report["ell_minmax_ms"] / max(implied, 1e-9), 2
    )
    print(json.dumps(report))


if __name__ == "__main__":
    main()
