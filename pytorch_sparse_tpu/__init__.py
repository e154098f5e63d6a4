"""pytorch_sparse_tpu — a TPU-native sparse linear-algebra framework.

Brand-new JAX/XLA/Pallas implementation with the capabilities of
``rusty1s/pytorch_sparse`` (reference surveyed in ``SURVEY.md``): immutable
pytree ``SparseTensor`` with COO/CSR/CSC views and observable format caches,
autograd-capable SpMM (sum/mean/min/max) and SpSpMM, the full structural op
set, graph partitioning, graph samplers, and a multi-chip distribution layer
over ``jax.sharding`` meshes.
"""

__version__ = "0.1.0"

from .storage import SparseStorage  # noqa
from .tensor import SparseTensor  # noqa

# Op modules attach SparseTensor methods on import.
from .ops import (  # noqa
    spmm_sum, spmm_add, spmm_mean, spmm_min, spmm_max, spspmm_sum, matmul,
    expansion_terms, spspmm_chunked, spspmm_native, spspmm_stream,
    spspmm_diag, spspmm_stream_device,
    HybridFormat, build_hybrid_from_tensor, hybrid_spmm,
    t, transpose, coalesce, eye, spmm, spspmm, spadd,
    to_jax_sparse, from_jax_sparse, to_torch_sparse, from_torch_sparse,
    to_scipy, from_scipy,
    add, add_, add_nnz, add_nnz_, mul, mul_, mul_nnz, mul_nnz_,
    reduction, sum, mean, min, max,
    non_diag_mask, remove_diag, set_diag, fill_diag, get_diag,
    index_select, index_select_nnz, masked_select, masked_select_nnz,
    narrow, __narrow_diag__, select, cat, permute, reverse_cuthill_mckee,
)
from .utils import ind2ptr, ptr2ind, index_sort, save_npz, load_npz  # noqa

# Samplers + partitioning attach further SparseTensor methods on import.
from .sample import (  # noqa
    random_walk, sample, sample_adj, saint_subgraph, ego_k_hop_sample_adj,
    relabel, relabel_one_hop, neighbor_sample, hetero_neighbor_sample,
    hetero_temporal_neighbor_sample, hgt_sample,
)
from .partition import (  # noqa
    mt_partition, partition, partition_fine, weight2metis,
)

__all__ = [
    "SparseStorage",
    "SparseTensor",
    "spmm_sum",
    "spmm_add",
    "spmm_mean",
    "spmm_min",
    "spmm_max",
    "spspmm_sum",
    "expansion_terms",
    "spspmm_chunked",
    "spspmm_native",
    "spspmm_stream",
    "spspmm_diag",
    "spspmm_stream_device",
    "HybridFormat",
    "build_hybrid_from_tensor",
    "hybrid_spmm",
    "matmul",
    "t",
    "transpose",
    "coalesce",
    "eye",
    "spmm",
    "spspmm",
    "spadd",
    "to_jax_sparse",
    "from_jax_sparse",
    "to_torch_sparse",
    "from_torch_sparse",
    "to_scipy",
    "from_scipy",
    "add",
    "add_",
    "add_nnz",
    "add_nnz_",
    "mul",
    "mul_",
    "mul_nnz",
    "mul_nnz_",
    "reduction",
    "sum",
    "mean",
    "min",
    "max",
    "__narrow_diag__",
    "non_diag_mask",
    "remove_diag",
    "set_diag",
    "fill_diag",
    "get_diag",
    "index_select",
    "index_select_nnz",
    "masked_select",
    "masked_select_nnz",
    "narrow",
    "select",
    "cat",
    "permute",
    "reverse_cuthill_mckee",
    "ind2ptr",
    "ptr2ind",
    "index_sort",
    "save_npz",
    "load_npz",
    "random_walk",
    "sample",
    "sample_adj",
    "saint_subgraph",
    "ego_k_hop_sample_adj",
    "relabel",
    "relabel_one_hop",
    "neighbor_sample",
    "hetero_neighbor_sample",
    "hetero_temporal_neighbor_sample",
    "hgt_sample",
    "partition",
    "partition_fine",
    "mt_partition",
    "weight2metis",
    "__version__",
]
