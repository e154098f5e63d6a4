"""Isolate the Pallas reduce kernel cost: MXU precision vs grid overhead."""

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from timing import device_time

from pytorch_sparse_tpu.ops.kernels.spmm_pallas import build_chunk_table

M = 169_343
E = 1_166_243
K = 128

rng = np.random.RandomState(0)
row_np = np.sort(rng.randint(0, M, E)).astype(np.int32)
rowptr = np.zeros(M + 1, np.int64)
np.add.at(rowptr, row_np + 1, 1)
rowptr = np.cumsum(rowptr)


def make_reduce(TM, C, mode):
    cb, ce, fi, nb = build_chunk_table(rowptr, M, TM, C)
    n_chunks = cb.shape[0]
    E_pad = (E // C + 1) * C
    row_pad = np.full(E_pad, M, np.int32)
    row_pad[:E] = row_np
    row2d = jnp.asarray(row_pad.reshape(1, E_pad))
    cb, ce, fi = jnp.asarray(cb), jnp.asarray(ce), jnp.asarray(fi)

    def kernel(cb_ref, ce_ref, fi_ref, row_ref, h_ref, out_ref):
        t = pl.program_id(0)
        blk = cb_ref[t]
        lr = row_ref[:] - blk * TM
        if mode == "null":
            @pl.when(fi_ref[t] == 1)
            def _():
                out_ref[:] = h_ref[:TM, :]
            return
        onehot = (
            jax.lax.broadcasted_iota(jnp.int32, (TM, C), 0) == lr
        ).astype(jnp.float32)
        prec = (
            jax.lax.Precision.HIGHEST if mode == "highest"
            else jax.lax.Precision.DEFAULT
        )
        partial = jax.lax.dot(
            onehot, h_ref[:], precision=prec,
            preferred_element_type=jnp.float32,
        )

        @pl.when(fi_ref[t] == 1)
        def _():
            out_ref[:] = partial

        @pl.when(fi_ref[t] == 0)
        def _():
            out_ref[:] = out_ref[:] + partial

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((1, C), lambda t, cb, ce, fi: (0, ce[t]),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, K), lambda t, cb, ce, fi: (ce[t], 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TM, K), lambda t, cb, ce, fi: (cb[t], 0),
                               memory_space=pltpu.VMEM),
    )
    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb * TM, K), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )

    def fn(h):  # h: (E_pad, K) carry-preserving: reduce then re-embed
        out = call(cb, ce, fi, row2d, h)
        return h.at[: nb * TM].add(out * 1e-30)

    return fn, E_pad, n_chunks


for TM, C, mode in [
    (128, 1024, "null"),
    (128, 1024, "highest"),
    (128, 1024, "default"),
    (128, 2048, "null"),
    (128, 2048, "default"),
    (256, 2048, "default"),
]:
    fn, E_pad, n_chunks = make_reduce(TM, C, mode)
    h = jnp.asarray(rng.randn(E_pad, K).astype(np.float32))
    dt = device_time(fn, h)
    # subtract the re-embed add cost? report raw; compare across modes.
    print(
        f"TM={TM:4d} C={C:5d} mode={mode:8s} chunks={n_chunks:6d} "
        f"{dt*1e3:8.3f} ms ({dt/n_chunks*1e6:6.2f} us/chunk)"
    )
    sys.stdout.flush()
