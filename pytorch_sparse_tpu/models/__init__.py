"""Model family built on the sparse ops — the GNN layers PyTorch Geometric
builds on top of the reference library (GCN / GraphSAGE / GAT / GIN), here
as pure-JAX functional models so a torch_sparse+PyG user can switch over.
"""

from .gcn import GCN, gcn_norm  # noqa
from .sage import GraphSAGE  # noqa
from .gat import GAT  # noqa
from .gin import GIN  # noqa
from .dist_gcn import DistGCN  # noqa
