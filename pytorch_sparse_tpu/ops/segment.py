"""Re-export shim: segment reductions live at the package top level
(``pytorch_sparse_tpu/segment.py``) so ``storage.py`` can use them without
importing the op package (which would be circular)."""

from ..segment import (  # noqa
    segment_sum, segment_count, segment_mean, segment_min, segment_max,
    segment_reduce,
)
