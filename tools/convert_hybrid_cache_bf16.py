#!/usr/bin/env python
"""Convert a cached hybrid npz's block store to bf16 IN PLACE
(host-only, no device).  Halves the bench's warm-load + upload cost
(serialize stores bf16 as u2 words + a dtype record).

Usage: python tools/convert_hybrid_cache_bf16.py <path.npz>
"""

import sys

import ml_dtypes
import numpy as np


def main(path):
    data = dict(np.load(path, allow_pickle=False))
    key = "_hybrid.blocks"
    if f"{key}.dtype" in data:
        print(f"{path}: blocks already {data[key + '.dtype']}")
        return
    blocks = data[key]
    assert blocks.dtype == np.float32, blocks.dtype
    data[key] = blocks.astype(ml_dtypes.bfloat16).view(np.uint16)
    data[f"{key}.dtype"] = np.str_("bfloat16")
    np.savez(path, **data)
    print(f"{path}: blocks f32 -> bf16 "
          f"({blocks.nbytes / 1e9:.1f} -> {blocks.nbytes / 2e9:.1f} GB)")


if __name__ == "__main__":
    main(sys.argv[1])
