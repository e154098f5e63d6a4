"""COO<->CSR conversion microbenchmark (port of the reference's
``benchmark/ptr2ind.py:42-65`` protocol: bucketize-style ind2ptr vs
repeat-style ptr2ind on the current device)."""

import os
import sys

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from timing import device_time

from pytorch_sparse_tpu.utils import ind2ptr, ptr2ind


def main():
    M = 169_343
    E = 1_166_243
    rng = np.random.RandomState(0)
    row = jnp.asarray(np.sort(rng.randint(0, M, E)).astype(np.int32))
    rowptr = ind2ptr(row, M)
    print(f"# device={jax.devices()[0]}, M={M}, E={E}")

    # shape-preserving chains for the slope timer
    dt = device_time(
        lambda r: ptr2ind(ind2ptr(r, M), E), row
    )
    print(f"ind2ptr+ptr2ind roundtrip {dt*1e3:8.3f} ms")
    dt = device_time(
        lambda p: ind2ptr(ptr2ind(p, E), M), rowptr
    )
    print(f"ptr2ind+ind2ptr roundtrip {dt*1e3:8.3f} ms")


if __name__ == "__main__":
    main()
