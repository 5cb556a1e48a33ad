"""CUB-shaped compatibility surface — DeviceRadixSort / DeviceSegmentedRadixSort.

A user of the reference stack (`cub::DeviceRadixSort`,
`device_radix_sort.cuh:339-3152`; `cub::DeviceSegmentedRadixSort`,
`device_segmented_radix_sort.cuh`) can switch to this module and find the
same entry points with the same knobs:

    from cuda.radixsort_tpu.cub_compat import DeviceRadixSort, DoubleBuffer

    out = DeviceRadixSort.SortKeys(keys, begin_bit=0, end_bit=32)
    k, v = DeviceRadixSort.SortPairs(keys, values)
    k, v = DeviceRadixSort.SortPairsDescending(keys, values)
    buf = DoubleBuffer(keys)
    buf = DeviceRadixSort.SortKeys(buf)          # buf.current() is sorted

Differences dictated by the platform, not hidden:
  * no d_temp_storage two-phase size query — XLA owns allocation (the CUB
    nullptr-call protocol exists to size scratch; here `jax.jit` does it);
  * everything is functional — "overwrite" is expressed by donating the
    input buffer (`jax.jit(..., donate_argnums=0)`), and DoubleBuffer is a
    thin selector object kept for call-site compatibility;
  * `stream` arguments are accepted and ignored (XLA schedules).
"""

from __future__ import annotations

from typing import Any

from cuda.radixsort_tpu.ops.segmented import segmented_sort as _segmented
from cuda.radixsort_tpu.ops.sort import sort as _sort
from cuda.radixsort_tpu.ops.sort import sort_pairs as _sort_pairs


class DoubleBuffer:
    """cub::DoubleBuffer (util_type.cuh:735) compatibility selector.

    Functional backends have no ping-pong buffers; this object just tracks
    "current" so CUB-shaped call sites keep working. `alternate()` returns
    the previous current after a sort (CUB semantics: selector flips)."""

    def __init__(self, current, alternate=None):
        self._bufs = [current, alternate]
        self.selector = 0

    def current(self):
        return self._bufs[self.selector]

    def alternate(self):
        return self._bufs[1 - self.selector]

    def _flip_to(self, new_current):
        self._bufs[1 - self.selector] = self._bufs[self.selector]
        self._bufs[self.selector] = new_current
        return self


def _unwrap(x):
    return (x.current(), True) if isinstance(x, DoubleBuffer) else (x, False)


def _rewrap(out, orig, was_buffer):
    if was_buffer:
        return orig._flip_to(out)
    return out


class DeviceRadixSort:
    """Parity: cub::DeviceRadixSort (device_radix_sort.cuh:142)."""

    @staticmethod
    def SortKeys(d_keys, num_items: int | None = None, begin_bit: int = 0,
                 end_bit: int | None = None, stream: Any = None, *,
                 config=None):
        keys, wrapped = _unwrap(d_keys)
        _check_items(keys, num_items)
        out = _sort(keys, begin_bit=begin_bit, end_bit=end_bit,
                    config=config)
        return _rewrap(out, d_keys, wrapped)

    @staticmethod
    def SortKeysDescending(d_keys, num_items: int | None = None,
                           begin_bit: int = 0, end_bit: int | None = None,
                           stream: Any = None, *, config=None):
        keys, wrapped = _unwrap(d_keys)
        _check_items(keys, num_items)
        out = _sort(keys, descending=True, begin_bit=begin_bit,
                    end_bit=end_bit, config=config)
        return _rewrap(out, d_keys, wrapped)

    @staticmethod
    def SortPairs(d_keys, d_values, num_items: int | None = None,
                  begin_bit: int = 0, end_bit: int | None = None,
                  stream: Any = None, *, config=None):
        keys, kw = _unwrap(d_keys)
        values, vw = _unwrap(d_values)
        _check_items(keys, num_items)
        ok, ov = _sort_pairs(keys, values, begin_bit=begin_bit,
                             end_bit=end_bit, config=config)
        return _rewrap(ok, d_keys, kw), _rewrap(ov, d_values, vw)

    @staticmethod
    def SortPairsDescending(d_keys, d_values, num_items: int | None = None,
                            begin_bit: int = 0, end_bit: int | None = None,
                            stream: Any = None, *, config=None):
        keys, kw = _unwrap(d_keys)
        values, vw = _unwrap(d_values)
        _check_items(keys, num_items)
        ok, ov = _sort_pairs(keys, values, descending=True,
                             begin_bit=begin_bit, end_bit=end_bit,
                             config=config)
        return _rewrap(ok, d_keys, kw), _rewrap(ov, d_values, vw)


class DeviceSegmentedRadixSort:
    """Parity: cub::DeviceSegmentedRadixSort (one sort per segment).

    d_begin_offsets/d_end_offsets follow CUB's API; the common contiguous
    case (end_offsets = begin_offsets[1:]) maps to one offsets array."""

    @staticmethod
    def _offsets(num_segments, d_begin_offsets, d_end_offsets, n):
        import jax.numpy as jnp

        if d_end_offsets is None:
            return d_begin_offsets
        # contiguous segments: [begin, end) chains; validate cheaply
        return jnp.concatenate(
            [d_begin_offsets[:num_segments], d_end_offsets[num_segments - 1:
                                                           num_segments]])

    @staticmethod
    def SortKeys(d_keys, num_items: int | None = None,
                 num_segments: int | None = None, d_begin_offsets=None,
                 d_end_offsets=None, stream: Any = None, *,
                 descending: bool = False, config=None):
        keys, wrapped = _unwrap(d_keys)
        _check_items(keys, num_items)
        ns = num_segments or (d_begin_offsets.shape[0] - 1)
        offs = DeviceSegmentedRadixSort._offsets(
            ns, d_begin_offsets, d_end_offsets, keys.shape[0])
        out = _segmented(keys, offs, descending=descending,
                         num_segments_bound=ns, config=config)
        return _rewrap(out, d_keys, wrapped)

    @staticmethod
    def SortPairs(d_keys, d_values, num_items: int | None = None,
                  num_segments: int | None = None, d_begin_offsets=None,
                  d_end_offsets=None, stream: Any = None, *,
                  descending: bool = False, config=None):
        keys, kw = _unwrap(d_keys)
        values, vw = _unwrap(d_values)
        _check_items(keys, num_items)
        ns = num_segments or (d_begin_offsets.shape[0] - 1)
        offs = DeviceSegmentedRadixSort._offsets(
            ns, d_begin_offsets, d_end_offsets, keys.shape[0])
        ok, ov = _segmented(keys, offs, values, descending=descending,
                            num_segments_bound=ns, config=config)
        return _rewrap(ok, d_keys, kw), _rewrap(ov, d_values, vw)

    @staticmethod
    def SortKeysDescending(*args, **kw):
        return DeviceSegmentedRadixSort.SortKeys(*args, descending=True,
                                                 **kw)

    @staticmethod
    def SortPairsDescending(*args, **kw):
        return DeviceSegmentedRadixSort.SortPairs(*args, descending=True,
                                                  **kw)


def _check_items(keys, num_items):
    if num_items is not None and num_items != keys.shape[0]:
        raise ValueError(
            f"num_items={num_items} != len(keys)={keys.shape[0]} — slice "
            "the array (XLA shapes are static)")
