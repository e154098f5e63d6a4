"""Probe: is a VMEM-blocked column-locality SpMM kernel expressible?

VERDICT round-1 item 1 proposed streaming X column tiles through VMEM
and gathering each edge's row from the resident tile, fusing gather and
segment-reduce in one pass.  This probe measures the two primitives the
design needs and records why the design is NOT implementable on this
toolchain (jax 0.9 / Mosaic):

1. ``tpu.dynamic_gather`` (the lowering of ``jnp.take_along_axis``)
   requires ``indices.shape == operand.shape + (1,)``
   (jax/_src/pallas/mosaic/lowering.py:2493) — the table and the output
   must have the same row count — AND it is "Not implemented: Multiple
   source vregs along gather dimension": the gather window along the
   sublane axis is ONE vreg = 8 rows (f32).  A per-edge row gather from
   a multi-thousand-row VMEM tile is therefore not expressible; the only
   in-VMEM gather Mosaic can compile reaches 8 source rows.
2. ``jnp.cumsum`` along the edge axis (the scatter-free segment-reduce
   building block) DOES lower and is measured below — recorded for any
   future Mosaic version that lifts the gather restriction.

Together with the round-1 findings (per-edge HBM DMA issue cost 50-100
cycles; XLA cannot fuse gather into the reduction), this closes the
single-pass-fusion direction: on this hardware/toolchain the ELL path's
two-pass structure IS the floor for gather-bound SpMM, and beating the
roofline requires removing gathers (the hybrid block-dense MXU format).
"""

import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/benchmarks")
import timing  # noqa: F401  (persistent compile cache)
from timing import device_time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T = 2048    # edges per chunk
K = 128


def _call(kernel, out_shape, *args):
    return pl.pallas_call(
        kernel,
        out_shape=out_shape,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(args),
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(*args)


def probe_gather_restriction():
    """Demonstrate the dynamic_gather limits: an 8-row window works, a
    2048-row table does not ("Multiple source vregs along gather
    dimension")."""
    rng = np.random.RandomState(0)

    # (a) big-table row gather: expected to FAIL to compile
    x = jnp.asarray(rng.randn(T, K).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, T, (T, 1)).astype(np.int32))

    def gather_kernel(idx_ref, x_ref, o_ref):
        idx2 = jnp.broadcast_to(idx_ref[:], (T, K))
        o_ref[:] = jnp.take_along_axis(x_ref[:], idx2, axis=0)

    try:
        out = _call(gather_kernel,
                    jax.ShapeDtypeStruct((T, K), jnp.float32), idx, x)
        out.block_until_ready()
        ref = np.asarray(x)[np.asarray(idx)[:, 0]]
        print("big-table gather: COMPILED, max err",
              np.abs(np.asarray(out) - ref).max())
        return True
    except Exception as e:  # noqa: BLE001
        msg = str(e)
        key = "Multiple source vregs along gather dimension"
        print("big-table gather: NOT COMPILABLE"
              + (f" ({key})" if key in msg else f": {msg[:120]}"))

    # (b) 8-row window gather (single f32 vreg): expected to work
    x8 = jnp.asarray(rng.randn(8, K).astype(np.float32))
    idx8 = jnp.asarray(rng.randint(0, 8, (8, 1)).astype(np.int32))

    def gather8_kernel(idx_ref, x_ref, o_ref):
        idx2 = jnp.broadcast_to(idx_ref[:], (8, K))
        o_ref[:] = jnp.take_along_axis(x_ref[:], idx2, axis=0)

    try:
        out = _call(gather8_kernel,
                    jax.ShapeDtypeStruct((8, K), jnp.float32), idx8, x8)
        ref = np.asarray(x8)[np.asarray(idx8)[:, 0]]
        err = np.abs(np.asarray(out) - ref).max()
        print(f"8-row window gather: works (max err {err}) — the only "
              "in-VMEM gather Mosaic compiles")
    except Exception as e:  # noqa: BLE001
        print("8-row window gather also failed:", str(e)[:120])
    return False


def _loop_time(make_body, label, *args, reps=(8, 40)):
    """Time `body` repeated R times inside one kernel; slope removes the
    fixed kernel overhead."""
    times = []
    for R in reps:
        def kernel(*refs):
            o_ref = refs[-1]

            def body(i, acc):
                return acc + make_body(i, refs[:-1])

            o_ref[:] = jax.lax.fori_loop(
                0, R, body, jnp.zeros(o_ref.shape, o_ref.dtype)
            )

        fn = lambda *a: _call(  # noqa: E731
            kernel, jax.ShapeDtypeStruct((T, K), jnp.float32), *a
        )
        dt = device_time(fn, *args)
        times.append(dt)
    per = (times[1] - times[0]) / (reps[1] - reps[0])
    per_edge_ns = per / T * 1e9
    print(f"{label}: {per * 1e6:.2f} us/op, {per_edge_ns:.3f} ns/edge "
          f"({T / per / 1e9:.2f} Gedge/s)")
    return per


def main():
    print("devices:", jax.devices())
    gather_ok = probe_gather_restriction()
    rng = np.random.RandomState(1)
    h = jnp.asarray(rng.randn(T, K).astype(np.float32))

    # cumsum over the edge axis — the segment-reduce building block
    def c_body(i, refs):
        (h_ref,) = refs
        return jnp.cumsum(h_ref[:] + i, axis=0)

    try:
        _loop_time(c_body, "cumsum (T,K) axis=0", h)
    except Exception as e:  # noqa: BLE001
        print("cumsum: NOT COMPILABLE:", str(e)[:160])

    if not gather_ok:
        print("VERDICT: VMEM-blocked gather SpMM not expressible on this "
              "Mosaic (gather window = 1 vreg); negative result recorded.")


if __name__ == "__main__":
    main()
