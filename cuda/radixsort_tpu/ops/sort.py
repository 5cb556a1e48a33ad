"""LSD radix sort — the core pipeline of the framework.

Reference semantics: the per-digit CUDA pipeline (per-block digit histogram ->
exclusive prefix-scan over the striped spine -> stable scatter), as in the
reference repo and its canonical form `CUB/device/dispatch/dispatch_radix_sort.cuh`
(`InvokePasses` :822-988 pass planning, `InvokePass` :362-488 upsweep/scan/downsweep)
with the striped spine layout of `CUB/device/dispatch/kernels/radix_sort.cuh:58-60`
(digit-major, tile-minor: spine[digit * num_tiles + tile]).

TPU-native design (NOT a translation):
  * keys live as 2-D column batches (rows x 128 lanes), tiles are
    ``tile_rows x 128`` blocks;
  * one jit-compiled graph contains every digit pass (no host loop);
  * double buffering is functional (XLA owns buffers; donation handles reuse);
  * wide keys (u64/f64/i64) are decomposed into u32 limb *columns* and sorted
    by LSD over limbs — no 64-bit arithmetic on the TPU VPU (the decomposer
    protocol analogue of CUB `util_type.cuh:528-567`);
  * three engines share one layout: 'pallas' (fast kernels), 'reference'
    (pure-jnp oracle, identical spine math), 'xla' (lax.sort fallback — the
    analogue of thrust's merge-sort path for non-primitive cases,
    `THRUST/system/cuda/detail/sort.h:333-337`).
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp

from cuda.radixsort_tpu import config as config_lib
from cuda.radixsort_tpu import twiddle

# ---------------------------------------------------------------------------
# pass planning (reference: dispatch_radix_sort.cuh:915-936 — alt smaller-radix
# passes run first so every pass is radix_bits or radix_bits-1 wide)
# ---------------------------------------------------------------------------


def plan_passes(begin_bit: int, end_bit: int, radix_bits: int) -> list[tuple[int, int]]:
    """Return [(shift, width), ...] LSD pass plan covering [begin_bit, end_bit)."""
    num_bits = end_bit - begin_bit
    if num_bits <= 0:
        return []
    num_passes = -(-num_bits // radix_bits)
    alt_bits = radix_bits - 1
    num_alt = num_passes * radix_bits - num_bits
    if alt_bits == 0 or num_alt > num_passes:
        # degenerate radix; fall back to uneven last pass
        plan, shift = [], begin_bit
        while shift < end_bit:
            w = min(radix_bits, end_bit - shift)
            plan.append((shift, w))
            shift += w
        return plan
    plan, shift = [], begin_bit
    for p in range(num_passes):
        w = alt_bits if p < num_alt else radix_bits
        plan.append((shift, w))
        shift += w
    assert shift == end_bit
    return plan


# ---------------------------------------------------------------------------
# padding to whole tiles
# ---------------------------------------------------------------------------


# Device paths index rows with int32 (iota payloads, spine bases, pad to the
# next power of two); past 2^31 rows that arithmetic would wrap silently.
# CUB widens to u64 offsets instead (choose_offset_t,
# device_radix_sort.cuh:353) and portions the input
# (dispatch_radix_sort.cuh:570-576); here >2^31 is the out-of-core domain.
_DEVICE_MAX_N = 1 << 31


def _check_device_n(n: int) -> None:
    if n > _DEVICE_MAX_N:
        raise ValueError(
            f"device sort paths are int32-indexed (max {_DEVICE_MAX_N} "
            f"rows); got {n}. Use cuda.radixsort_tpu.ops.external."
            "sort_external / sort_external_pairs for out-of-core sizes "
            "(CUB handles this with u64 offsets + 2^30-item portions, "
            "device_radix_sort.cuh:353, dispatch_radix_sort.cuh:570-576).")


def _pad_amount(n: int, tile_elems: int) -> int:
    full = -(-max(n, 1) // tile_elems) * tile_elems
    return full - n


def _pad_bits(bits: jnp.ndarray, pad: int) -> jnp.ndarray:
    if pad == 0:
        return bits
    # all-ones pads sort to the very end of every ascending digit pass and stay
    # there (stability), so a final [:n] slice recovers the result.
    fill = jnp.full((pad,), jnp.iinfo(bits.dtype).max, dtype=bits.dtype)
    return jnp.concatenate([bits, fill])


def _pad_zeros(x: jnp.ndarray, pad: int) -> jnp.ndarray:
    if pad == 0:
        return x
    return jnp.concatenate([x, jnp.zeros((pad,) + x.shape[1:], dtype=x.dtype)])


# ---------------------------------------------------------------------------
# one counting pass — pure-jnp reference engine
# ---------------------------------------------------------------------------


def _tile_histogram(digit_tiles: jnp.ndarray, num_bins: int) -> jnp.ndarray:
    """Per-tile digit histogram: (T, n) int digits -> (T, B) counts.

    Reference role: the upsweep agent (CUB agent_radix_sort_upsweep.cuh:382-422).
    """
    t = digit_tiles.shape[0]
    rows = jnp.broadcast_to(jnp.arange(t, dtype=jnp.int32)[:, None], digit_tiles.shape)
    return (
        jnp.zeros((t, num_bins), jnp.int32)
        .at[rows, digit_tiles]
        .add(1, mode="drop", unique_indices=False)
    )


def spine_scan(hist: jnp.ndarray) -> jnp.ndarray:
    """Exclusive scan over the striped spine.

    hist: (T, B). Returns base: (B, T) where base[d, t] is the global output
    offset of (digit d, tile t) — digit-major, tile-minor, exactly the striped
    spine of the reference (kernels/radix_sort.cuh:58-60, scan kernel :146-178).
    """
    spine = hist.T.reshape(-1)
    base = jnp.cumsum(spine) - spine  # exclusive
    return base.reshape(hist.shape[1], hist.shape[0]).astype(jnp.int32)


def _tile_rank(digit_tiles: jnp.ndarray) -> jnp.ndarray:
    """Stable rank of each element among equal digits within its tile.

    Reference role: BlockRadixRank (CUB block_radix_rank.cuh:438-495). Here
    computed with a stable per-tile argsort + run-position recovery (oracle
    engine only; the Pallas engine computes ranks with cumsum tile math).
    """
    t, n = digit_tiles.shape
    order = jnp.argsort(digit_tiles, axis=1, stable=True)
    sd = jnp.take_along_axis(digit_tiles, order, axis=1)
    pos = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), (t, n))
    is_start = jnp.concatenate(
        [jnp.ones((t, 1), bool), sd[:, 1:] != sd[:, :-1]], axis=1
    )
    run_start = jax.lax.cummax(jnp.where(is_start, pos, 0), axis=1)
    rank_sorted = pos - run_start
    rows = jnp.arange(t, dtype=jnp.int32)[:, None]
    return jnp.zeros_like(digit_tiles, dtype=jnp.int32).at[rows, order].set(rank_sorted)


def counting_pass_reference(
    digits: jnp.ndarray, num_bins: int, tile_elems: int
) -> jnp.ndarray:
    """One stable counting pass: digits (N,) -> destination permutation (N,).

    dest[i] = spine_base[digit[i], tile[i]] + within-tile stable rank — the
    exact downsweep math (agent_radix_sort_downsweep.cuh:502-591) in jnp.
    """
    n = digits.shape[0]
    t = n // tile_elems
    dt = digits.reshape(t, tile_elems)
    hist = _tile_histogram(dt, num_bins)
    base = spine_scan(hist)  # (B, T)
    rank = _tile_rank(dt)
    tile_idx = jnp.broadcast_to(jnp.arange(t, dtype=jnp.int32)[:, None], dt.shape)
    dest = base[dt, tile_idx] + rank
    return dest.reshape(-1)


def apply_permutation(dest: jnp.ndarray, arrays: Sequence[jnp.ndarray]):
    """Scatter each array by out[dest[i]] = a[i] (dest is a bijection)."""
    return [
        jnp.zeros_like(a).at[dest].set(a, mode="drop", unique_indices=True)
        for a in arrays
    ]


# ---------------------------------------------------------------------------
# the LSD driver over limb columns
# ---------------------------------------------------------------------------


def _widen_u32(p: jnp.ndarray) -> jnp.ndarray:
    """Bit-preserving widen of a sub-4-byte payload column to uint32.
    Integers/bool widen by value (round-trips exactly through the modular
    narrow); small floats (f16/bf16) bitcast to the same-width uint first
    so no value rounding occurs."""
    if jnp.issubdtype(p.dtype, jnp.floating):
        bits = jax.lax.bitcast_convert_type(
            p, jnp.dtype(f"uint{8 * jnp.dtype(p.dtype).itemsize}"))
        return bits.astype(jnp.uint32)
    return p.astype(jnp.uint32)


def _narrow_u32(o: jnp.ndarray, dtype) -> jnp.ndarray:
    """Inverse of _widen_u32."""
    if jnp.issubdtype(dtype, jnp.floating):
        bits = o.astype(jnp.dtype(f"uint{8 * jnp.dtype(dtype).itemsize}"))
        return jax.lax.bitcast_convert_type(bits, dtype)
    return o.astype(dtype)


def _sort_limbs(
    limbs: list[jnp.ndarray],
    limb_bits: list[tuple[int, int]],
    payloads: list[jnp.ndarray],
    cfg: config_lib.SortConfig,
    stable: bool = True,
    unique_leading_payload: bool = False,
):
    """LSD sort of uint32 limb columns (least-significant column first).

    limbs[k] is a (N,) uint32 column; limb_bits[k] = (begin_bit, end_bit) of
    that column that participate in ordering. Unsigned ascending. Returns
    (limbs, payloads) permuted into sorted order. ``stable=False`` relaxes
    the equal-key payload order (thrust::sort_by_key semantics, THRUST
    sort.h smart_sort — the reference's non-stable_ entry points), which
    drops the index tie-break plane from the bitonic path: one less plane
    through every compare-exchange stage.

    ``unique_leading_payload=True`` declares that payloads[0] is a UNIQUE
    uint32 row tag never equal to 0xFFFFFFFF (e.g. the arange-based
    position companions the join internals carry). The tag then serves as
    the stability tie-break comparand itself — output is sorted by
    (key, tag), one plane cheaper than the stable path (no internal index
    plane). When the tag is strictly increasing in input order this is
    bit-identical to the stable sort.
    """
    if cfg.engine == "bitonic":
        # full-range pairs with 4-byte payloads ride the multi-plane network:
        # (key limbs..., index, payloads...) with n_cmp = limbs+1 — the index
        # plane makes (key, index) a total order, so the network is STABLE.
        # Measured v5e: 531 M pairs/s @2^25 = 1.8x over the stable lax.sort
        # path (the r1 fallback). Plane counts > 4 lose VMEM/program budget;
        # bit-range sorts keep lax.sort (they need masked compares).
        # stable=False skips the index plane entirely: compare-exchange
        # networks are correct under ties (equal comparands may swap, which
        # only permutes equal-key payloads) — u32+pay = 2 planes, u64+pay =
        # 3. Round-3 per-plane accounting (NOTES: +27.9 ms idx compare plane
        # @2^25) projects ~930 M pairs/s for the 2-plane layout.
        full = all(b == 0 and e == 32 for (b, e) in limb_bits)
        # sub-4-byte payloads widen to u32 planes (bit-preserving — see
        # _widen_u32); only >4-byte payloads disqualify the network
        four_byte = all(jnp.dtype(p.dtype).itemsize <= 4 for p in payloads)
        tag = (unique_leading_payload and bool(payloads)
               and payloads[0].dtype == jnp.uint32)
        n_total = (len(limbs) + (1 if stable and not tag else 0)
                   + len(payloads))
        # compiled Pallas needs a TPU; on CPU the network runs only under
        # interpret (and multi-plane interpret is pathologically slow), so
        # plain-CPU bitonic pairs degrade to the stable lax.sort path
        runnable = config_lib.default_backend() == "tpu" or cfg.interpret
        # size/padding gate (measured v5e): the network reaches lax.sort
        # parity at ~2^22 and wins from ~2^23 up (3-plane: 1.0x @2^22 ->
        # 1.8x @2^25; 4-plane: 1.36x @2^25), BUT it pads to a power of two
        # while lax.sort does not — at npad/n near 2 the padding eats the
        # speedup (measured: 16M+2M-row join 4x slower padded to 2^25).
        # Route to the network only when size x padding still projects a win.
        n_rows = limbs[0].shape[0]
        logn = max((n_rows - 1).bit_length(), 10)
        npad = 1 << logn
        ratio = npad / n_rows
        if _split_sort_engages(n_rows, logn):
            # split-sort-merge engages (_bitonic_planes_split): effective
            # work = sort(2^(logn-1)) + sort(rest's own power of two) + one
            # merge level — heavy padding no longer disqualifies the
            # network (r5: the 151M-row join concat previously fell to
            # lax.sort on ratio 1.78; with the split it runs 945.8 ->
            # 471.1 ms = 285 M rows/s, BENCH_SUITE_r05)
            ratio = _split_work_rows(n_rows, logn) / n_rows
        if n_total <= 3:
            projected_win = npad >= (1 << 23) and ratio < 1.6
        else:
            projected_win = npad >= (1 << 24) and ratio < 1.25
        if (full and four_byte and payloads and n_total <= 4 and runnable
                and (projected_win or cfg.interpret)):
            n = limbs[0].shape[0]
            pay_u32 = [
                p if p.dtype == jnp.uint32
                else (p.view(jnp.uint32)
                      if jnp.dtype(p.dtype).itemsize == 4
                      else _widen_u32(p))
                for p in payloads
            ]
            if stable and tag:
                # the caller's unique u32 tag is the tie-break comparand:
                # no internal index plane (pads stay strictly greatest —
                # real tags never equal 0xFFFFFFFF)
                planes = list(limbs) + pay_u32
                n_cmp = len(limbs) + 1
            elif stable:
                idx = jnp.arange(n, dtype=jnp.uint32)
                planes = list(limbs) + [idx] + pay_u32
                n_cmp = len(limbs) + 1
            else:
                planes = list(limbs) + pay_u32
                # exact power of two: tie-safe rides (negative n_cmp — the
                # kernel comparator never exchanges tied rows, bitonic.py
                # _cmpex_planes). Padded: the 0xFFFFFFFF pad rows would TIE
                # with real max-key rows and tie-safe can't order them past
                # the pads, so compare ALL planes instead — pads then tie
                # only with bit-identical real rows, which are
                # interchangeable. Both orderings are valid unstable sorts.
                n_cmp = (-len(limbs) if npad == n else len(planes))
            out = _bitonic_planes(planes, n, n_cmp=n_cmp, cfg=cfg)
            out_limbs = out[: len(limbs)]
            skip = len(limbs) + (1 if stable and not tag else 0)
            out_pays = [
                o if p.dtype == jnp.uint32
                else (o.view(p.dtype)
                      if jnp.dtype(p.dtype).itemsize == 4
                      else _narrow_u32(o, p.dtype))
                for o, p in zip(out[skip:], payloads)
            ]
            return out_limbs, out_pays
        # bit ranges, wide payloads, many columns: stable lax.sort fallback
        cfg = cfg.replace(engine="xla")
    if cfg.engine == "xla":
        # sort keys = limbs masked to the participating bit range (most
        # significant limb first = primary key); original limbs ride along as
        # payload so out-of-range bits survive untouched. When every limb
        # participates fully the masked copies are skipped (the hot path for
        # plain full-width sorts — matches raw lax.sort cost).
        full = all(b == 0 and e == 32 for (b, e) in limb_bits)
        if full:
            operands = list(limbs) + list(payloads)
            out = jax.lax.sort(
                operands, num_keys=len(limbs), is_stable=True, dimension=0
            )
            k = len(limbs)
            return list(out[:k]), list(out[k:])
        masked = [
            c & jnp.uint32(((1 << e) - 1) & ~((1 << b) - 1) & 0xFFFFFFFF)
            for c, (b, e) in zip(limbs, limb_bits)
        ]
        operands = masked + list(limbs) + list(payloads)
        out = jax.lax.sort(operands, num_keys=len(limbs), is_stable=True, dimension=0)
        k = len(limbs)
        return list(out[k : 2 * k]), list(out[2 * k :])

    n = limbs[0].shape[0]
    if cfg.engine == "pallas":
        from cuda.radixsort_tpu.kernels import pipeline as kpipe

        tile_elems = kpipe.tile_elems(cfg)
    else:
        tile_elems = cfg.tile_elems
    pad = _pad_amount(n, tile_elems)
    limbs = [_pad_bits(c, pad) for c in limbs]
    payloads = [_pad_zeros(p, pad) for p in payloads]

    if cfg.engine == "pallas":
        # sub-4-byte payloads (bool masks, i8/i16) WIDEN to u32 planes and
        # narrow back after — one cheap elementwise pass each way. Only
        # >4-byte payloads take the index-truck + gather route: the TPU
        # gather runs at ~0.11 G rows/s, and a single bool column used to
        # drag EVERY payload column through it (~37 ms each @4M, r5 — it
        # was most of the outer join's filter cost).
        planes, spec = [], []   # spec: (orig_dtype_or_None, n_planes)
        rideable = True
        for p in payloads:
            isz = jnp.dtype(p.dtype).itemsize
            if isz == 4:
                planes.append(p)
                spec.append((None, 1))
            elif isz < 4:
                planes.append(_widen_u32(p))
                spec.append((p.dtype, 1))
            elif isz == 8 and jnp.issubdtype(p.dtype, jnp.integer):
                # 8-byte integers split into (lo, hi) u32 planes; f64
                # stays on the gather route — this backend's X64 rewriter
                # has no 64-bit float bitcast (verified r5)
                both = jax.lax.bitcast_convert_type(p, jnp.uint32)
                planes.extend([both[:, 0], both[:, 1]])
                spec.append((p.dtype, 2))
            else:
                rideable = False
                break
        if rideable:
            limbs, outp = kpipe.sort_limbs_pallas(
                limbs, limb_bits, planes, cfg
            )
            payloads, i = [], 0
            for d, k in spec:
                if k == 1:
                    payloads.append(outp[i] if d is None
                                    else _narrow_u32(outp[i], d))
                else:
                    payloads.append(jax.lax.bitcast_convert_type(
                        jnp.stack([outp[i], outp[i + 1]], axis=-1), d))
                i += k
        else:
            # f64 (or exotic) payloads: truck an index through the kernel
            # permutation, then gather (values-follow-keys, CUB
            # GatherScatterValues analogue).
            idx = jnp.arange(limbs[0].shape[0], dtype=jnp.int32)
            limbs, (perm,) = kpipe.sort_limbs_pallas(
                limbs, limb_bits, [idx], cfg
            )
            payloads = [jnp.take(p, perm, axis=0) for p in payloads]
    else:
        for k in range(len(limbs) - 1, -1, -1):  # least-significant column first
            begin, end = limb_bits[k]
            for shift, width in plan_passes(begin, end, cfg.radix_bits):
                digits = (
                    (limbs[k] >> jnp.uint32(shift)) & jnp.uint32((1 << width) - 1)
                ).astype(jnp.int32)
                dest = counting_pass_reference(digits, 1 << width, cfg.tile_elems)
                limbs = apply_permutation(dest, limbs)
                payloads = apply_permutation(dest, payloads)

    if pad:
        limbs = [c[:n] for c in limbs]
        payloads = [p[:n] for p in payloads]
    return limbs, payloads


# ---------------------------------------------------------------------------
# key <-> limb-column adapters (the decomposer protocol analogue)
# ---------------------------------------------------------------------------


def _key_to_limbs(keys: jnp.ndarray, descending: bool, begin_bit, end_bit):
    """Twiddle keys and decompose into uint32 limb columns, most-significant
    limb first. Returns (limbs, limb_bits)."""
    width = twiddle.bit_width(keys.dtype)
    begin = 0 if begin_bit is None else begin_bit
    end = width if end_bit is None else end_bit
    if not (0 <= begin <= end <= width):
        raise ValueError(f"bad bit range [{begin}, {end}) for {keys.dtype}")
    bits = twiddle.twiddle_in(keys, descending=descending)
    if width <= 32:
        limbs = [bits.astype(jnp.uint32)]
        limb_bits = [(begin, end)]
    else:  # 64-bit keys: two u32 limb columns, no 64-bit VPU math after this.
        hi = (bits >> jnp.uint64(32)).astype(jnp.uint32)
        lo = (bits & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)
        limbs = [hi, lo]
        lo_range = (min(begin, 32), min(end, 32))
        hi_range = (max(begin, 32) - 32, max(end, 32) - 32)
        limb_bits = [hi_range, lo_range]
    return limbs, limb_bits


def _limbs_to_key(limbs: list[jnp.ndarray], dtype, descending: bool):
    width = twiddle.bit_width(dtype)
    if width <= 32:
        bits = limbs[0].astype(twiddle.unsigned_dtype(dtype))
        if width < 32:
            bits = bits & jnp.array((1 << width) - 1, bits.dtype)
    else:
        bits = (limbs[0].astype(jnp.uint64) << jnp.uint64(32)) | limbs[1].astype(
            jnp.uint64
        )
    return twiddle.twiddle_out(bits, dtype, descending=descending)


# ---------------------------------------------------------------------------
# public API — reference parity: CUB DeviceRadixSort::{SortKeys, SortPairs,
# SortKeysDescending, SortPairsDescending} (device_radix_sort.cuh:339-3152)
# with begin_bit/end_bit digit-range restriction.
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit, static_argnames=("descending", "begin_bit", "end_bit", "config")
)
def sort(
    keys: jnp.ndarray,
    *,
    descending: bool = False,
    begin_bit: int | None = None,
    end_bit: int | None = None,
    config: config_lib.SortConfig | None = None,
) -> jnp.ndarray:
    """Stable radix sort of a 1-D key array. Parity: DeviceRadixSort::SortKeys."""
    cfg = config_lib.resolve(config)
    _check_device_n(keys.shape[0])
    if keys.shape[0] == 0:
        return keys
    width = twiddle.bit_width(keys.dtype)
    full_range = (begin_bit is None or begin_bit == 0) and (
        end_bit is None or end_bit == width
    )
    if cfg.engine == "bitonic" and full_range:
        # 32-bit-wide: 1-plane network; 64-bit: (hi, lo) 2-plane lexicographic
        return _sort_keys_bitonic(keys, descending, cfg)
    limbs, limb_bits = _key_to_limbs(keys, descending, begin_bit, end_bit)
    limbs, _ = _sort_limbs(limbs, limb_bits, [], cfg)
    return _limbs_to_key(limbs, keys.dtype, descending)


@functools.partial(
    jax.jit,
    static_argnames=("descending", "begin_bit", "end_bit", "config", "stable",
                     "unique_leading_payload"),
)
def sort_pairs(
    keys: jnp.ndarray,
    values,
    *,
    descending: bool = False,
    begin_bit: int | None = None,
    end_bit: int | None = None,
    config: config_lib.SortConfig | None = None,
    stable: bool = True,
    unique_leading_payload: bool = False,
):
    """Key-value radix sort. ``values`` may be any pytree of arrays with
    leading dim == len(keys). Parity: DeviceRadixSort::SortPairs (stable);
    ``stable=False`` matches thrust::sort_by_key (THRUST sort.h smart_sort),
    whose radix path does not promise equal-key payload order — on the
    bitonic engine that drops the index tie-break plane (u32+pay: 2 planes
    instead of 3; u64+pay: 3 instead of 4), one less plane through every
    compare-exchange stage. ``unique_leading_payload=True``: the first
    flattened payload leaf is a unique u32 row tag (see _sort_limbs) that
    serves as the stability tie-break itself — stable result, one plane
    cheaper."""
    cfg = config_lib.resolve(config)
    _check_device_n(keys.shape[0])
    leaves, treedef = jax.tree_util.tree_flatten(values)
    if keys.shape[0] == 0:
        return keys, values
    limbs, limb_bits = _key_to_limbs(keys, descending, begin_bit, end_bit)
    limbs, leaves = _sort_limbs(limbs, limb_bits, list(leaves), cfg,
                                stable=stable,
                                unique_leading_payload=unique_leading_payload)
    out_keys = _limbs_to_key(limbs, keys.dtype, descending)
    return out_keys, jax.tree_util.tree_unflatten(treedef, leaves)


# ---------------------------------------------------------------------------
# bitonic engine dispatch — keys-only full-range sorts (kernels/bitonic.py).
# Bitonic networks are not stable, but keys-only ties are identical values,
# so instability is unobservable; pairs/argsort/bit-range keep radix/xla.
# Measured on TPU v5e: 3.5x over lax.sort @2^24, 3.1x @2^26 (NOTES.md).
# ---------------------------------------------------------------------------


def _bitonic_planes(planes, n, n_cmp, cfg):
    """Pad u32 planes to a power of two with max sentinels, run the network,
    trim. Pads are lexicographically >= every real row, so they sort to the
    global tail.

    Heavy padding (>= 25% of the padded size, e.g. a 151M-row join concat
    padded to 2^28) takes the SPLIT-SORT-MERGE route instead: sort the
    leading 2^(logn-1) rows ascending, the remainder descending at its own
    (much smaller) power of two, and finish with the single top bitonic
    merge level — O(n1 + n2) sort work + one merge pass instead of a full
    network over the padded size. Measured r5: the 134M x 16M join's
    concat sort was the 2.3x gap to its power-of-two twin."""
    from cuda.radixsort_tpu.kernels import bitonic as bkern

    logn = max((n - 1).bit_length(), 10)
    npad = 1 << logn
    if n_cmp > 0 and _split_sort_engages(n, logn):
        return _bitonic_planes_split(planes, n, n_cmp, cfg, logn)
    if npad != n:
        planes = [
            jnp.concatenate([p, jnp.full((npad - n,), 0xFFFFFFFF, jnp.uint32)])
            for p in planes
        ]
    # 3+ planes default to lt=15: 3% slower than lt=16 at 2^25 but the
    # tile-sort program compiles 2.6x faster (79 s vs 209 s cold through
    # the tunnel — the <2 min compile budget, NOTES r2)
    lt_default = 16 if len(planes) <= 2 else 15
    # Interpret mode (CI only — hardware never takes it) routes 3+-plane
    # sorts through the COMPACT bodies: the standard 3-plane tile body
    # never finishes the XLA-CPU interpret compile (NOTES r4 cliff,
    # >500 s at n=256) while compact compiles in seconds. Same math,
    # measured-slower-on-hardware only (NOTES r2) — irrelevant under CI.
    compact = True if (cfg.interpret and len(planes) >= 3) else None
    out = bkern.sort_planes_bitonic(
        planes, n_cmp=n_cmp, log_tile=min(cfg.log_tile or lt_default, logn),
        log_merge=cfg.log_merge, interpret=cfg.interpret, compact=compact,
    )
    if npad != n:
        out = [p[:n] for p in out]
    return out


def _split_work_rows(n: int, logn: int) -> float:
    """Projected row-work of the split-sort-merge route: sort the leading
    2^(logn-1), sort the remainder at its own power of two, plus ~0.2 of a
    padded-size pass structure for the top merge level (spans + merge)."""
    npad = 1 << logn
    rest = n - (npad >> 1)
    n2 = 1 << max((rest - 1).bit_length(), 10)
    return (npad >> 1) + n2 + 0.2 * npad


def _split_sort_engages(n: int, logn: int) -> bool:
    """Split-sort-merge routing: engage when the projected split work beats
    the direct padded sort by >=10% (a remainder just over a power of two
    pads to half the array and would LOSE) and the pieces are big enough
    for the fixed merge overhead (2^19; RS_SPLIT_SORT_MIN_LOGN lowers it
    for CI). RS_SPLIT_SORT=0 disables."""
    import os

    npad = 1 << logn
    if npad == n or os.environ.get("RS_SPLIT_SORT", "1") != "1":
        return False
    min_logn = int(os.environ.get("RS_SPLIT_SORT_MIN_LOGN", "19"))
    return logn >= min_logn and _split_work_rows(n, logn) < 0.9 * npad


def _bitonic_planes_split(planes, n, n_cmp, cfg, logn):
    """Split-sort-merge for heavily padded sorts (see _bitonic_planes).

    Layout: block 0 = leading 2^(logn-1) rows sorted ASCENDING; block 1 =
    the remainder sorted DESCENDING (via comparand complement — pads
    complement to the block's FRONT as max sentinels), padded to
    2^(logn-1); one bitonic merge level (log_block = logn-1) finishes.
    Comparand planes must form the caller's usual order contract (n_cmp >
    0 here — the padded-unstable caller already switched to all-compare,
    and stable callers carry a global index/tag comparand, so ties merge
    stably)."""
    from cuda.radixsort_tpu.kernels import bitonic as bkern

    n1 = 1 << (logn - 1)
    rest = n - n1
    p1 = _bitonic_planes([p[:n1] for p in planes], n1, n_cmp, cfg)
    # descending remainder: ascending sort of complemented comparands;
    # internal 0xFFFFFFFF pads of the recursive call are the complement of
    # 0 (the minimum) and trim off the tail as usual
    comp = [~p[n1:] if i < n_cmp else p[n1:]
            for i, p in enumerate(planes)]
    p2 = _bitonic_planes(comp, rest, n_cmp, cfg)
    p2 = [~q if i < n_cmp else q for i, q in enumerate(p2)]
    # prepend max sentinels: [0xFF... pads, descending real] is a valid
    # descending block, and the pads exit through the merged tail
    pad = jnp.full((n1 - rest,), 0xFFFFFFFF, jnp.uint32)
    merged = bkern.merge_sorted_planes_bitonic(
        [jnp.concatenate([a, pad, d]) for a, d in zip(p1, p2)],
        log_block=logn - 1, n_cmp=n_cmp, log_merge=cfg.log_merge,
        interpret=cfg.interpret,
        compact=True if (cfg.interpret and len(planes) >= 3) else None,
    )
    return [m[:n] for m in merged]


def _sort_keys_bitonic(keys, descending: bool, cfg) -> jnp.ndarray:
    n = keys.shape[0]
    limbs, _ = _key_to_limbs(keys, descending, None, None)
    out = _bitonic_planes(limbs, n, n_cmp=len(limbs), cfg=cfg)
    return _limbs_to_key(out, keys.dtype, descending)


def _argsort_bitonic(keys, descending: bool, cfg) -> jnp.ndarray:
    """Stable argsort on the network: an index plane as the lexicographic
    tiebreak makes (key, index) a total order — ties never swap. Measured
    2.1x over the 2-operand lax.sort path @2^22 (NOTES.md)."""
    n = keys.shape[0]
    limbs, _ = _key_to_limbs(keys, descending, None, None)
    if len(limbs) != 1:
        raise ValueError("bitonic argsort is 32-bit-wide only")
    idx = jnp.arange(n, dtype=jnp.uint32)
    out = _bitonic_planes([limbs[0], idx], n, n_cmp=2, cfg=cfg)
    return out[1].astype(jnp.int32)


# ---------------------------------------------------------------------------
# hybrid large-N sort: MSD Pallas partition + batched XLA bucket sort.
#
# XLA's sort is O(n log^2 n) comparator rounds and its throughput decays with
# N (measured: 0.47 G/s @2^24 -> 0.32 G/s @2^27, experiments/probe7.py);
# batching many small sorts is ~1.7x faster per element. So for large N we
# cut log n first: partition by the top `msd_bits` with the Pallas stage
# kernel (linear), then sort the 2^msd_bits value-disjoint buckets as one
# batched (B, cap) lax.sort. Two host-level jit phases — the bucket capacity
# must be static (the same two-phase sizing protocol as the reference's
# temp-storage query, CUB device_radix_sort.cuh:339).
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit, static_argnames=("descending", "msd_bits", "config")
)
def _hybrid_partition(keys, *, descending: bool, msd_bits: int, config):
    """Phase A: twiddle + stable MSD partition by the top `msd_bits` bits.
    Returns (partitioned_bits (padded), bucket bounds (B+1,))."""
    from cuda.radixsort_tpu.kernels import pipeline as kpipe

    bits = twiddle.twiddle_in(keys, descending=descending).astype(jnp.uint32)
    pad = _pad_amount(bits.shape[0], kpipe.tile_elems(config_lib.resolve(config)))
    bits = _pad_bits(bits, pad)
    (pb,), _ = kpipe.sort_limbs_pallas(
        [bits], [(32 - msd_bits, 32)], [], config
    )
    nb = 1 << msd_bits
    # bucket boundaries: binary search works because the partitioned array is
    # monotone in its top msd_bits (buckets are value-disjoint ranges)
    q = (jnp.arange(nb, dtype=jnp.uint32) << jnp.uint32(32 - msd_bits))
    tops = jnp.searchsorted(pb, q, side="left").astype(jnp.int32)
    bounds = jnp.concatenate(
        [tops, jnp.array([pb.shape[0]], jnp.int32)]
    )
    return pb, bounds


@functools.partial(jax.jit, static_argnames=("cap", "group"))
def _hybrid_bucket_sort(pb, bounds, *, cap: int, group: int):
    """Phase B: slice each bucket to a (group, cap) batch (DMA dynamic
    slices, not gathers), pad with the max sentinel, batched lax.sort, and
    write back with increasing-order dynamic updates — each bucket's padding
    tail is exactly overwritten by the next bucket's write."""
    npad = pb.shape[0]
    nb = bounds.shape[0] - 1
    counts = jnp.diff(bounds)
    flat = jnp.concatenate(
        [pb, jnp.full((cap,), 0xFFFFFFFF, jnp.uint32)]
    )
    lane = jnp.arange(cap, dtype=jnp.int32)[None, :]

    def step(out, s):
        d0 = s * group
        rows = [
            jax.lax.dynamic_slice(
                flat, (jax.lax.dynamic_index_in_dim(bounds, d0 + g, keepdims=False),),
                (cap,))
            for g in range(group)
        ]
        mat = jnp.stack(rows)
        cnt = jax.lax.dynamic_slice(counts, (d0,), (group,))
        # pads == max key sort into the tail; a real 0xFFFFFFFF key is
        # indistinguishable from a pad, so the first count[d] slots always
        # hold the right multiset (keys-only property)
        mat = jnp.where(lane < cnt[:, None], mat, jnp.uint32(0xFFFFFFFF))
        mat = jnp.sort(mat, axis=-1)
        for g in range(group):
            out = jax.lax.dynamic_update_slice(
                out, mat[g],
                (jax.lax.dynamic_index_in_dim(bounds, d0 + g, keepdims=False),))
        return out, None

    out0 = jnp.full((npad + cap,), 0xFFFFFFFF, jnp.uint32)
    out, _ = jax.lax.scan(step, out0, jnp.arange(nb // group))
    return out[:npad]


def _round_cap_fine(c: int) -> int:
    """Round a bucket capacity up with <=1/16 slack (16 variants/octave)."""
    c = max(int(c), 256)
    q = 1 << max((c - 1).bit_length() - 4, 8)
    return -(-c // q) * q


def sort_large(
    keys: jnp.ndarray,
    *,
    descending: bool = False,
    msd_bits: int | None = None,
    config: config_lib.SortConfig | None = None,
) -> jnp.ndarray:
    """Hybrid MSD-partition + batched-bucket-sort (host-level, two jit
    phases; the bucket capacity is measured, then compiled static).

    NOTE: measured SLOWER than `sort` (0.55-0.77x of lax.sort @2^24-2^27;
    the bitonic engine is 3-4x faster still — experiments/probe8.py,
    NOTES.md). Kept as the reference implementation of the two-phase
    capacity protocol and for memory-bounded scenarios where the padded
    bucket batch must be chunked; prefer `sort` everywhere else. Falls
    back to `sort` for small inputs and non-32-bit keys.
    """
    cfg = config_lib.resolve(config)
    n = keys.shape[0]
    if twiddle.bit_width(keys.dtype) != 32:
        return sort(keys, descending=descending, config=config)
    if msd_bits is None:  # explicit msd_bits forces the hybrid path (tests)
        if n < (1 << 22):
            return sort(keys, descending=descending, config=config)
        msd_bits = 4 if n < (1 << 28) else 8
    pb, bounds = _hybrid_partition(
        keys, descending=descending, msd_bits=msd_bits,
        config=cfg.replace(engine="pallas"))
    nb = 1 << msd_bits
    cap = _round_cap_fine(int(jnp.max(jnp.diff(bounds))))
    # bound the per-step batch footprint to ~2^26 elements
    group = max(1, min(nb, (1 << 26) // cap))
    while nb % group:
        group -= 1
    out_bits = _hybrid_bucket_sort(pb, bounds, cap=cap, group=group)
    return twiddle.twiddle_out(out_bits[:n], keys.dtype, descending=descending)


@functools.partial(jax.jit, static_argnames=("descending", "config",
                                              "stable"))
def sort_struct(
    key_columns,
    values=None,
    *,
    descending: bool = False,
    config: config_lib.SortConfig | None = None,
    stable: bool = True,
):
    """Lexicographic sort (stable by default) by a sequence of key columns,
    most significant first — the decomposer protocol for user-defined struct
    keys (reference: CUB ``util_type.cuh:528-567`` ``traits_t<T,false>`` /
    ``custom_digit_extractor_t``, where a custom type sorts by a tuple of
    its arithmetic members). ``stable=False`` drops the index tie-break
    plane (thrust::sort_by_key semantics for struct keys).

    key_columns: sequence of equal-length 1-D arrays, any supported key
    dtype each (mixed dtypes fine — each column twiddles independently).
    values: optional pytree of payload columns. Returns (sorted key columns
    as a tuple, sorted values) or just the tuple when values is None.
    ``stable=False`` relaxes equal-key payload order (thrust::sort_by_key
    semantics) — on the bitonic engine the tie-safe comparator drops the
    index plane, e.g. u64-as-(hi, lo) + one payload runs 3 planes. This is
    the u64 pairs route on x64-off backends (np.uint64 would truncate).
    """
    cols = list(key_columns)
    if not cols:
        raise ValueError("need at least one key column")
    _check_device_n(cols[0].shape[0])
    cfg = config_lib.resolve(config)
    limbs, limb_bits, spans = [], [], []
    for col in cols:
        l, b = _key_to_limbs(col, descending, None, None)
        spans.append(len(l))
        limbs += l
        limb_bits += b
    leaves, treedef = jax.tree_util.tree_flatten(values)
    limbs, leaves = _sort_limbs(limbs, limb_bits, list(leaves), cfg,
                                stable=stable)
    out_cols, i = [], 0
    for col, span in zip(cols, spans):
        out_cols.append(_limbs_to_key(limbs[i:i + span], col.dtype, descending))
        i += span
    if values is None:
        return tuple(out_cols)
    return tuple(out_cols), jax.tree_util.tree_unflatten(treedef, leaves)


@functools.partial(
    jax.jit, static_argnames=("descending", "begin_bit", "end_bit", "config")
)
def argsort(
    keys: jnp.ndarray,
    *,
    descending: bool = False,
    begin_bit: int | None = None,
    end_bit: int | None = None,
    config: config_lib.SortConfig | None = None,
) -> jnp.ndarray:
    """Stable argsort via an index payload trucked through the permutation
    (the reference's values-follow-keys scheme, downsweep :470-485)."""
    cfg = config_lib.resolve(config)
    _check_device_n(keys.shape[0])
    width = twiddle.bit_width(keys.dtype)
    full_range = (begin_bit is None or begin_bit == 0) and (
        end_bit is None or end_bit == width
    )
    if (cfg.engine == "bitonic" and full_range and width <= 32
            and keys.shape[0] > 0):
        return _argsort_bitonic(keys, descending, cfg)
    idx = jnp.arange(keys.shape[0], dtype=jnp.int32)
    _, perm = sort_pairs(
        keys,
        idx,
        descending=descending,
        begin_bit=begin_bit,
        end_bit=end_bit,
        config=config,
    )
    return perm
