from .metis import mt_partition, partition, partition_fn, weight2metis  # noqa
