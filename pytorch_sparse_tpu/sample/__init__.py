"""Graph sampling primitives (reference ``csrc/*sample*.cpp``, ``rw.cpp``,
``saint.cpp``, ``relabel.cpp``).

Two tiers, per SURVEY.md §7.6:

* Device tier (JAX, PRNGKey-threaded, jit-able): ``random_walk`` and
  per-row uniform ``sample`` vectorize cleanly ("pre-draw rand matrix,
  then gather").
* Host tier (numpy, insertion-order relabeling; accelerated by the C++
  native library when built): the hash-relabel samplers whose output
  shapes are data-dependent — ``sample_adj``, ``neighbor_sample`` (homo /
  hetero / temporal), ``ego_k_hop_sample_adj``, ``hgt_sample``,
  ``saint_subgraph``, ``relabel``.

Determinism contract: every randomized sampler takes an explicit ``seed``
(int or numpy Generator); same seed => identical output (the reference
routes all draws through torch's global generator,
``csrc/cpu/utils.h:40-50``).
"""

from .rw import random_walk  # noqa
from .sample import sample, sample_adj  # noqa
from .saint import saint_subgraph  # noqa
from .ego import ego_k_hop_sample_adj  # noqa
from .relabel import relabel, relabel_one_hop  # noqa
from .neighbor import (  # noqa
    neighbor_sample, hetero_neighbor_sample,
    hetero_temporal_neighbor_sample,
)
from .hgt import hgt_sample  # noqa
