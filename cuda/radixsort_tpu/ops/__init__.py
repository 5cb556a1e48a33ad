"""Single-chip operator layer: sort, partition, join, aggregate, filter."""

from cuda.radixsort_tpu.ops.sort import argsort, sort, sort_pairs  # noqa: F401
