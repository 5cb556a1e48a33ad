"""cuda.radixsort_tpu — a TPU-native vectorized query-execution engine.

A brand-new TPU-first framework (JAX / XLA / Pallas / shard_map) with the
capabilities of the reference CUDA LSD radix sort (truongchauhien/CUDA.RadixSort,
canonical form: CUB DeviceRadixSort): the per-digit pipeline — per-tile digit
histogram, exclusive prefix-scan over the striped spine, stable scatter —
re-designed as Pallas kernels over HBM-resident column batches and generalized
into a full operator set (radix partition, hash join, hash aggregate, predicate
filter with selection vectors) scaled over a device mesh with a skew-aware,
double-buffered all-to-all shuffle.

Public API (reference parity: CUB `device_radix_sort.cuh`, thrust `sort.h`):
    sort, sort_pairs, argsort       — stable radix sort (keys / key-value)
    SortConfig, preset              — tuning policy (analogue of the CUB policy hub)
"""

from cuda.radixsort_tpu.config import (  # noqa: F401
    LANES,
    SortConfig,
    best_engine,
    preset,
    resolve,
)
from cuda.radixsort_tpu.ops.sort import (  # noqa: F401
    argsort,
    sort,
    sort_large,
    sort_pairs,
    sort_struct,
)
from cuda.radixsort_tpu.ops.select import kth_value, top_k  # noqa: F401
from cuda.radixsort_tpu.ops.partition import bucket_ids, hash32, partition  # noqa: F401
from cuda.radixsort_tpu.ops.filter import filter_columns, selection_vector  # noqa: F401
from cuda.radixsort_tpu.ops.join import join  # noqa: F401
from cuda.radixsort_tpu.ops.aggregate import (  # noqa: F401
    groupby,
    groupby_multi,
    groupby_quantile,
)
from cuda.radixsort_tpu.ops.scan import scan_by_key, segmented_scan  # noqa: F401
from cuda.radixsort_tpu.ops.window import window  # noqa: F401
from cuda.radixsort_tpu.ops.external import (  # noqa: F401
    sort_external,
    sort_external_pairs,
)
from cuda.radixsort_tpu.ops.segmented import segmented_sort  # noqa: F401
from cuda.radixsort_tpu.ops.unique import (  # noqa: F401
    distinct,
    non_trivial_runs,
    run_length_encode,
    unique,
)
from cuda.radixsort_tpu.ops.merge import (  # noqa: F401
    merge_sorted,
    merge_sorted_pairs,
)
from cuda.radixsort_tpu.ops.setops import (  # noqa: F401
    set_difference,
    set_intersection,
    set_symmetric_difference,
    set_union,
)
from cuda.radixsort_tpu.ops.histogram import (  # noqa: F401
    digit_histogram,
    histogram_even,
    histogram_range,
)
from cuda.radixsort_tpu.ops.join import join_count, join_expand  # noqa: F401
from cuda.radixsort_tpu.ops.comparator_sort import (  # noqa: F401
    comparator_argsort,
    comparator_sort,
)
from cuda.radixsort_tpu.pipeline.plan import Query  # noqa: F401
from cuda.radixsort_tpu.table import Table, table  # noqa: F401
from cuda.radixsort_tpu import twiddle  # noqa: F401

__version__ = "0.1.0"
