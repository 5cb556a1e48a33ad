# Namespace package root for `cuda.radixsort_tpu` — the TPU-native framework with
# the capabilities of the reference CUDA LSD radix sort (truongchauhien/CUDA.RadixSort).
