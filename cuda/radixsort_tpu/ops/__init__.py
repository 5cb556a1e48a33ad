"""Single-chip operator layer: sort, partition, join, aggregate, filter, select."""

from cuda.radixsort_tpu.ops.sort import argsort, sort, sort_pairs  # noqa: F401
from cuda.radixsort_tpu.ops.select import kth_value, top_k  # noqa: F401
