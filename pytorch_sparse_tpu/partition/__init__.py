from .metis import partition, weight2metis, partition_fn  # noqa
