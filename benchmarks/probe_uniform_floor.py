"""Uniform-graph floor probes (VERDICT r4 item 3): three bytes-side
attacks on the 0.31x uniform SpMM number, each measured on the real
chip at the bench's arxiv-scale uniform config.

The shipped path sits at 98% of the measured two-pass floor
(probe_ell_decomp: fused gather+reduce 2.80 ms + inv_perm 0.62).  The
floor itself charges one 512 B f32 row gather per edge; these probes
attack the BYTES, not the pass structure:

  (a) interleaved (col, value) slot tables — the chain currently
      streams the (R, cap) index table and the (R, cap) baked value
      table separately; interleaving them into one int32 (R, 2*cap)
      buffer (value bitcast) halves the stream count.  Bounded by the
      slot-stream share of traffic (~8 of 520 B/edge ≈ 1.5%).
  (b) PAIRED-ROW bf16 mat store — bf16(x) halves the gather bytes but
      naively halves the granule to 256 B (measured 4x SLOWER, bf16
      gather lowering + granule, BASELINE round 1).  Pairing two bf16
      rows into one 512 B granule — stored as an int32 (ceil(M/2), K)
      table so the gather runs the GOOD int32 lowering — keeps the
      granule while halving bytes; the wanted half is selected
      in-register, accumulation stays f32.  Operand rounds to bf16
      (output rel err ~1e-3): an opt-in accuracy trade like the block
      store rule.
  (c) K-split concurrent gathers — two (M, K/2) tables gathered per
      slot; granule halves to 256 B, expected NEGATIVE per the granule
      sweeps, recorded for completeness.

Usage: python benchmarks/probe_uniform_floor.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from timing import device_time

jax.config.update("jax_default_matmul_precision", "highest")

import pytorch_sparse_tpu as ts
from pytorch_sparse_tpu.ops.kernels import ell as ellmod

M = 169_343
E = 1_166_243
K = 128


def build():
    rng = np.random.RandomState(0)
    row = np.sort(rng.randint(0, M, E)).astype(np.int32)
    col = rng.randint(0, M, E).astype(np.int32)
    order = np.lexsort((col, row))
    A = ts.SparseTensor(
        row=jnp.asarray(row[order]), col=jnp.asarray(col[order]),
        value=jnp.asarray(rng.randn(E).astype(np.float32)),
        sparse_sizes=(M, M), is_sorted=True, trust_data=True,
    )
    A.storage.ell()
    A.storage.ell_t()
    A.storage.ell_baked()
    A.storage.ell_t_baked()
    mat = jnp.asarray(rng.randn(M, K).astype(np.float32))
    return A, mat


def report(name, dt, note="", work=E):
    rate = f"{work / dt / 1e6:7.1f} Mnnz/s" if work else ""
    print(f"{name:34s} {dt * 1e3:7.3f} ms  {rate}  {note}", flush=True)


def main():
    A, mat = build()
    ell = A.storage.ell()
    value = A.storage.value()
    value_pad = jnp.concatenate([value, jnp.zeros((1,), value.dtype)])
    baked = [jnp.take(value_pad, eids, axis=0) for eids in ell.eids]
    print("caps:", ell.caps)

    # 0. shipped path
    dt = device_time(lambda m: ts.spmm_sum(A, m), mat)
    report("full spmm_sum (shipped)", dt)
    t_ship = dt

    def finish(outs):
        stk = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)
        if ell.n_zero:
            stk = jnp.pad(stk, ((0, ell.n_zero), (0, 0)))
        return jnp.take(stk, ell.inv_perm, axis=0)

    # reference (bucket order) for correctness of the probes
    def base_full(m):
        return finish([
            ellmod._bucket_sum(m, idx, vals)
            for idx, vals in zip(ell.idxs, baked)
        ])

    ref = np.asarray(base_full(mat))
    scale = np.abs(ref).max()

    # (a) interleaved (col, value-bitcast) tables, unrolled chain
    inter = [
        jnp.stack(
            [idx.astype(jnp.int32),
             jax.lax.bitcast_convert_type(vals, jnp.int32)], axis=2
        ).reshape(idx.shape[0], -1)
        for idx, vals in zip(ell.idxs, baked)
    ]

    def inter_bucket(m, tab, cap):
        acc = None
        for j in range(cap):
            pair = tab[:, 2 * j:2 * j + 2]              # (R, 2) one stream
            ix = pair[:, 0]
            v = jax.lax.bitcast_convert_type(pair[:, 1], jnp.float32)
            h = jnp.take(m, ix, axis=0) * v[:, None]
            acc = h if acc is None else acc + h
        return acc

    def inter_full(m):
        return finish([
            inter_bucket(m, tab, idx.shape[1])
            for tab, idx in zip(inter, ell.idxs)
        ])

    got = np.asarray(inter_full(mat))
    err = np.abs(got - ref).max() / scale
    dt = device_time(inter_full, mat)
    report("(a) interleaved col+val", dt, f"rel err {err:.1e}")

    # (b) paired-row bf16 mat store, int32-typed gather.
    # Packing: row pair (2r, 2r+1) -> (Mp2, K) int32 where word k holds
    # (row 2r)[k] in one bf16 half and (row 2r+1)[k] in the other; the
    # slot's row parity selects the half in-register after the gather.
    Mp2 = -(-(M + 1) // 2)  # pad row included, then round up to pairs

    def pair_bucket(packed, tab_idx, vals, cap):
        acc = None
        for j in range(cap):
            ix = tab_idx[:, j]
            g = jnp.take(packed, ix // 2, axis=0)        # (R, K) int32
            both = jax.lax.bitcast_convert_type(
                g, jnp.bfloat16
            )                                            # (R, K, 2)
            h = jnp.where(
                (ix % 2 == 1)[:, None], both[:, :, 1], both[:, :, 0]
            ).astype(jnp.float32)
            h = h * vals[:, j, None]
            acc = h if acc is None else acc + h
        return acc

    def pack2(m):
        mb = m.astype(jnp.bfloat16)
        mb = jnp.concatenate(
            [mb, jnp.zeros((Mp2 * 2 - M, K), jnp.bfloat16)]
        )
        pairs = mb.reshape(Mp2, 2, K).transpose(0, 2, 1)  # (Mp2, K, 2)
        return jax.lax.bitcast_convert_type(pairs, jnp.int32)

    packed = jax.jit(pack2)(mat)

    def pair_full(packed):
        return finish([
            pair_bucket(packed, idx, vals, idx.shape[1])
            for idx, vals in zip(ell.idxs, baked)
        ])

    got = np.asarray(pair_full(packed))
    err = np.abs(got - ref).max() / scale
    out0 = jnp.zeros((M, K), jnp.float32)
    # consume the carry inside the input so the loop body is not
    # hoisted (timing.py contract); bitwise_or with runtime-0 keeps
    # the packed bits intact.
    dt = device_time(
        lambda c, p: pair_full(
            jnp.bitwise_or(p, (c[0, 0] * 1e-30).astype(jnp.int32))
        ),
        out0, packed,
    )
    report("(b) paired-row bf16 store", dt, f"rel err {err:.1e}")
    # include the packing cost (one dense pass over x)
    dtp = device_time(
        lambda c, m: pack2(m + c[:1, :1].astype(m.dtype) * 1e-30),
        packed, mat,
    )
    report("(b) pack cost alone", dtp, "(amortizes over layers)", work=0)

    # (c) K-split concurrent gathers (two (M, K/2) tables)
    mL, mR = mat[:, :K // 2], mat[:, K // 2:]

    def ksplit_bucket(mL, mR, idx, vals, cap):
        acc = None
        for j in range(cap):
            ix = idx[:, j]
            h = jnp.concatenate(
                [jnp.take(mL, ix, axis=0), jnp.take(mR, ix, axis=0)],
                axis=1,
            ) * vals[:, j, None]
            acc = h if acc is None else acc + h
        return acc

    def ksplit_full(mL, mR):
        return finish([
            ksplit_bucket(mL, mR, idx, vals, idx.shape[1])
            for idx, vals in zip(ell.idxs, baked)
        ])

    got = np.asarray(ksplit_full(mL, mR))
    err = np.abs(got - ref).max() / scale
    dt = device_time(
        lambda c, a, b: ksplit_full(a + c[:1, :K // 2] * 1e-30, b),
        jnp.zeros((M, K), jnp.float32), mL, mR,
    )
    report("(c) K-split 2x(M,64) gathers", dt, f"rel err {err:.1e}")

    print(f"\nshipped {t_ship*1e3:.3f} ms; target 0.4x of baseline = "
          f"{E / (0.4 * 0.8 * 1.369e9) * 1e3:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
