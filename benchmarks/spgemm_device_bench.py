"""Device-accelerated SpGEMM numeric pass, measured (VERDICT r4 item 6).

Runs C = A @ A over a Reddit-shaped community graph through
``spspmm_stream_device``: the dense-block share on the MXU
(ops/kernels/block_spgemm.py), the cross-terms through the host
Gustavson stream — device windows are dispatched FIRST (async), so the
host stream overlaps the TPU.  Every piece reduces to a checksum and is
discarded (the full product materialized is ~100 GB at full scale —
streaming is the only viable form, BASELINE.md round 1).

Correctness oracle (exact, O(E)):  sum(C) = dot(colsum(A), rowsum(A)).

    python benchmarks/spgemm_device_bench.py --scale 0.1
    python benchmarks/spgemm_device_bench.py --scale 1.0 --skip-host-full
"""

import argparse
import json
import os
import sys
import time


def _log(msg):
    print(f"[spgemm_device_bench] {msg}", file=sys.stderr, flush=True)

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=float, default=0.1)
    ap.add_argument("--B", type=int, default=512)
    ap.add_argument("--min-density", type=float, default=0.02)
    ap.add_argument("--max-out-blocks", type=int, default=2048)
    ap.add_argument("--bf16-blocks", action="store_true",
                    help="store the D@D operands bf16 on device (halves "
                         "HBM; needed at full scale next to the window "
                         "carry)")
    ap.add_argument("--skip-host-full", action="store_true",
                    help="skip the host-only baseline (known ~300 s at "
                         "full scale)")
    ap.add_argument("--skip-device", action="store_true")
    args = ap.parse_args()

    import timing  # noqa: F401  (persistent compile cache)
    import jax.numpy as jnp
    from pytorch_sparse_tpu.ops.spgemm import (
        _block_split, expansion_terms, spspmm_stream, spspmm_stream_device,
    )

    report = {}
    rng = np.random.RandomState(0)
    M = int(232_965 * args.scale)
    E = int(114_615_892 * args.scale * 1.4)
    n_comm = max(int(300 * args.scale), 4)
    t0 = time.time()
    from pytorch_sparse_tpu.testing import community_graph

    A = community_graph(M, E, n_comm, intra_p=0.9, rng=rng)
    padj, pptr, _ = A.partition(max(n_comm // 10, 4))
    A = padj.set_value(
        jnp.asarray(rng.rand(padj.nnz()).astype(np.float32) + 0.5),
        layout="coo",
    )
    report["build_s"] = round(time.time() - t0, 1)
    _log(f"built in {report['build_s']}s")
    report["nodes"], report["nnz"] = M, int(A.nnz())
    terms = expansion_terms(A, A)
    report["terms"] = terms

    val = np.asarray(A.storage.value()).astype(np.float64)
    row = A.storage.numpy_view("row")
    col = A.storage.numpy_view("col")
    rowsum = np.zeros(M, np.float64)
    colsum = np.zeros(M, np.float64)
    np.add.at(rowsum, row, val)
    np.add.at(colsum, col, val)
    oracle = float(np.dot(colsum, rowsum))
    report["oracle_sum"] = oracle
    _log("oracle ready")

    if not args.skip_host_full:
        t0 = time.time()
        acc = 0.0
        for lo, hi, (rp, cc, vv) in spspmm_stream(A, A, raw=True):
            acc += float(vv.astype(np.float64).sum())
        report["host_only_s"] = round(time.time() - t0, 1)
        report["host_only_rel_err"] = abs(acc - oracle) / abs(oracle)
        report["host_Mterms_s"] = round(
            terms / report["host_only_s"] / 1e6, 1
        )

    if not args.skip_device:
        t0 = time.time()
        split = _block_split(
            A, args.B, args.min_density,
            jnp.bfloat16 if args.bf16_blocks else None,
        )
        blkA, srA, scA, remA, dnnz = split
        report["split_s"] = round(time.time() - t0, 1)
        _log(f"split in {report['split_s']}s")
        report["blocks"] = 0 if blkA is None else int(blkA.shape[0])
        report["dense_frac"] = round(dnnz / max(A.nnz(), 1), 3)
        t0 = time.time()
        acc = 0.0
        pending = []
        n_blk_windows = 0
        t_dd = None
        for piece in spspmm_stream_device(
            A, A, Bb=args.B, min_density=args.min_density,
            max_out_blocks=args.max_out_blocks,
            split_A=split, split_B=split, raw_coo=True,
        ):
            if piece[0] == "blocks":
                # async device reduce; collect, block at the end
                pending.append(jnp.sum(piece[3], dtype=jnp.float32))
                n_blk_windows += 1
            else:
                if t_dd is None:
                    # all device windows DISPATCHED (async) by now
                    t_dd = time.time() - t0
                vv = piece[3][2]
                if vv is not None:
                    acc += float(vv.astype(np.float64).sum())
        for p in pending:
            acc += float(p)
        dt = time.time() - t0
        _log(f"device stream done in {dt:.1f}s")
        report["device_split_s"] = round(dt, 1)
        if t_dd is not None:
            report["dd_dispatch_s"] = round(t_dd, 1)
            report["host_cross_s"] = round(dt - t_dd, 1)
        report["device_Mterms_s"] = round(terms / dt / 1e6, 1)
        report["blk_windows"] = n_blk_windows
        report["device_rel_err"] = abs(acc - oracle) / abs(oracle)
    print(json.dumps(report), flush=True)


if __name__ == "__main__":
    main()
