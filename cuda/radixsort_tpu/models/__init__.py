"""Flagship end-to-end pipelines ("models"): the benchmark sort / join / query
configurations from BASELINE.json, single-chip and distributed."""

from cuda.radixsort_tpu.models.flagships import REGISTRY  # noqa: F401
