from .convert import ind2ptr, ptr2ind, INDEX_DTYPE
from .index_sort import index_sort, lexsort_rows

__all__ = ["ind2ptr", "ptr2ind", "INDEX_DTYPE", "index_sort", "lexsort_rows"]
from .serialize import save_npz, load_npz  # noqa
from .profile import trace, annotate, timed  # noqa
