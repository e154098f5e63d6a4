"""Functional ops over :class:`SparseTensor`.

Importing this package attaches methods onto ``SparseTensor`` (mirroring the
reference's monkey-patching op modules).
"""

from .segment import (  # noqa
    segment_sum, segment_mean, segment_min, segment_max, segment_reduce,
    segment_count,
)
from .matmul import (  # noqa
    spmm_sum, spmm_add, spmm_mean, spmm_min, spmm_max, spmm as spmm_dispatch,
    spspmm_sum, matmul,
)
from .matmul import spspmm as spspmm_tensor  # noqa
from .spgemm import (  # noqa
    expansion_terms, spspmm_chunked, spspmm_native, spspmm_stream,
    spspmm_diag, spspmm_stream_device,
)
from .kernels.hybrid import (  # noqa
    HybridFormat, build_hybrid_from_tensor, hybrid_spmm,
)
from .transpose import t, transpose  # noqa
from .coalesce import coalesce  # noqa
from .eye import eye  # noqa
from .spmm import spmm  # noqa (legacy tuple API)
from .spspmm import spspmm  # noqa (legacy tuple API)
from .spadd import spadd  # noqa
from .convert import (  # noqa
    to_jax_sparse, from_jax_sparse, to_torch_sparse, from_torch_sparse,
    to_scipy, from_scipy,
)
from .add import add, add_, add_nnz, add_nnz_  # noqa
from .mul import mul, mul_, mul_nnz, mul_nnz_  # noqa
from .reduce import reduction, sum, mean, min, max  # noqa
from .diag import non_diag_mask, remove_diag, set_diag, fill_diag, get_diag  # noqa
from .index_select import index_select, index_select_nnz  # noqa
from .masked_select import masked_select, masked_select_nnz  # noqa
from .narrow import narrow, __narrow_diag__  # noqa
from .select import select  # noqa
from .cat import cat, cat_first, cat_second, cat_diag  # noqa
from .permute import permute  # noqa
from .bandwidth import reverse_cuthill_mckee  # noqa

# Reference-API parity methods (dtype/device/memory/torch interop).
from . import torch_compat  # noqa
