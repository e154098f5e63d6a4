from .metis import (  # noqa
    mt_partition, partition, partition_fine, partition_fn, weight2metis,
)
