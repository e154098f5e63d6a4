from .spmm_pallas import (  # noqa
    sorted_segment_reduce_matmul,
    build_chunk_table,
    pallas_available,
)
