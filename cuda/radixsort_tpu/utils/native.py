"""ctypes bindings for the native host runtime (csrc/hostutils.cpp).

Builds the shared library on first use (g++ -O3, cached under
csrc/build/) and exposes numpy-facing wrappers. Every entry point has a
pure-numpy fallback so the framework works without a toolchain — the native
path is the one that keeps up with 1B-key verification.

Role parity: the reference's host driver (main.cu [RECON]) — data init,
CPU oracle sort, verification, timing hooks.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_REPO = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
)
_SRC = os.path.join(_REPO, "csrc", "hostutils.cpp")
_BUILD = os.path.join(_REPO, "csrc", "build")
_SO = os.path.join(_BUILD, "libhostutils.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> str | None:
    os.makedirs(_BUILD, exist_ok=True)
    if os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
        return _SO
    cmd = [
        "g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread",
        "-o", _SO, _SRC,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return _SO
    except (OSError, subprocess.SubprocessError):
        return None


def lib():
    """The loaded native library, or None if unavailable."""
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        so = _build()
        if so is None:
            return None
        L = ctypes.CDLL(so)
        u32p = ctypes.POINTER(ctypes.c_uint32)
        i64p = ctypes.POINTER(ctypes.c_int64)
        L.rt_fill_random_u32.argtypes = [u32p, ctypes.c_int64, ctypes.c_uint64]
        L.rt_fill_skewed_u32.argtypes = [
            u32p, ctypes.c_int64, ctypes.c_uint64,
            ctypes.c_uint32, ctypes.c_uint32, ctypes.c_uint32,
        ]
        L.rt_lsd_sort_u32.argtypes = [u32p, u32p, ctypes.c_int64]
        L.rt_lsd_sort_pairs_u32.argtypes = [u32p, u32p, u32p, u32p,
                                            ctypes.c_int64]
        L.rt_verify_sorted_u32.argtypes = [u32p, ctypes.c_int64]
        L.rt_verify_sorted_u32.restype = ctypes.c_int64
        L.rt_compare_u32.argtypes = [u32p, u32p, ctypes.c_int64]
        L.rt_compare_u32.restype = ctypes.c_int64
        L.rt_histogram16.argtypes = [u32p, ctypes.c_int64, ctypes.c_int, i64p]
        u64p = ctypes.POINTER(ctypes.c_uint64)
        L.rt_lsd_sort_u64.argtypes = [u64p, u64p, ctypes.c_int64]
        L.rt_lsd_sort_pairs_u64.argtypes = [u64p, u32p, u64p, u32p,
                                            ctypes.c_int64]
        L.rt_verify_sorted_u64.argtypes = [u64p, ctypes.c_int64]
        L.rt_verify_sorted_u64.restype = ctypes.c_int64
        L.rt_compare_u64.argtypes = [u64p, u64p, ctypes.c_int64]
        L.rt_compare_u64.restype = ctypes.c_int64
        L.rt_kway_merge_u32.argtypes = [
            ctypes.POINTER(u32p), i64p, ctypes.c_int, ctypes.c_int64,
            u32p, ctypes.POINTER(u32p), u32p,
        ]
        _lib = L
        return _lib


def _p32(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32))


def random_u32(n: int, seed: int = 0) -> np.ndarray:
    L = lib()
    out = np.empty(n, np.uint32)
    if L is None:
        return np.random.default_rng(seed).integers(
            0, 2**32, size=n, dtype=np.uint32
        )
    L.rt_fill_random_u32(_p32(out), n, seed)
    return out


def skewed_u32(n: int, seed: int = 0, hot_key: int = 42,
               hot_fraction: float = 0.5) -> np.ndarray:
    L = lib()
    if L is None:
        rng = np.random.default_rng(seed)
        out = rng.integers(0, 2**32, size=n, dtype=np.uint32)
        out[rng.random(n) < hot_fraction] = hot_key
        return out
    out = np.empty(n, np.uint32)
    den = 1 << 30
    L.rt_fill_skewed_u32(_p32(out), n, seed, hot_key,
                         int(hot_fraction * den), den)
    return out


def lsd_sort_u32(keys: np.ndarray) -> np.ndarray:
    """Native CPU LSD radix sort (oracle). Returns a new sorted array."""
    L = lib()
    if L is None:
        return np.sort(keys, kind="stable")
    out = np.ascontiguousarray(keys, np.uint32).copy()
    tmp = np.empty_like(out)
    L.rt_lsd_sort_u32(_p32(out), _p32(tmp), out.shape[0])
    return out


def lsd_sort_pairs_u32(keys: np.ndarray, vals: np.ndarray):
    L = lib()
    if L is None:
        order = np.argsort(keys, kind="stable")
        return keys[order], vals[order]
    k = np.ascontiguousarray(keys, np.uint32).copy()
    v = np.ascontiguousarray(vals).view(np.uint32).copy()
    tk, tv = np.empty_like(k), np.empty_like(v)
    L.rt_lsd_sort_pairs_u32(_p32(k), _p32(v), _p32(tk), _p32(tv), k.shape[0])
    return k, v.view(vals.dtype)  # 4 passes (even) end back in k/v


def verify_sorted_u32(keys: np.ndarray) -> int:
    """-1 if ascending-sorted else first violating index."""
    L = lib()
    a = np.ascontiguousarray(keys, np.uint32)
    if L is None:
        bad = np.nonzero(a[:-1] > a[1:])[0]
        return int(bad[0]) if bad.size else -1
    return int(L.rt_verify_sorted_u32(_p32(a), a.shape[0]))


def compare_u32(a: np.ndarray, b: np.ndarray) -> int:
    """-1 if bit-identical else first differing index."""
    L = lib()
    aa = np.ascontiguousarray(a, np.uint32)
    bb = np.ascontiguousarray(b, np.uint32)
    if L is None:
        bad = np.nonzero(aa != bb)[0]
        return int(bad[0]) if bad.size else -1
    return int(L.rt_compare_u32(_p32(aa), _p32(bb), aa.shape[0]))


def histogram16(keys: np.ndarray, shift: int) -> np.ndarray:
    L = lib()
    a = np.ascontiguousarray(keys, np.uint32)
    if L is None:
        return np.bincount((a >> shift) & 15, minlength=16).astype(np.int64)
    out = np.zeros(16, np.int64)
    L.rt_histogram16(_p32(a), a.shape[0], shift,
                     out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    return out


def _p64(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64))


def lsd_sort_u64(keys: np.ndarray) -> np.ndarray:
    """Native CPU LSD radix sort of u64 keys (8 passes). Oracle for the
    64-bit limb pipeline and the 256M-pair contract config."""
    L = lib()
    if L is None:
        return np.sort(keys, kind="stable")
    out = np.ascontiguousarray(keys, np.uint64).copy()
    tmp = np.empty_like(out)
    L.rt_lsd_sort_u64(_p64(out), _p64(tmp), out.shape[0])
    return out


def lsd_sort_pairs_u64(keys: np.ndarray, vals: np.ndarray):
    """Stable native (u64 key, u32 payload) oracle pair sort."""
    L = lib()
    if L is None:
        o = np.argsort(keys, kind="stable")
        return keys[o], vals[o]
    ok = np.ascontiguousarray(keys, np.uint64).copy()
    ov = np.ascontiguousarray(vals, np.uint32).copy()
    tk = np.empty_like(ok)
    tv = np.empty_like(ov)
    L.rt_lsd_sort_pairs_u64(_p64(ok), _p32(ov), _p64(tk), _p32(tv),
                            ok.shape[0])
    return ok, ov


def verify_sorted_u64(keys: np.ndarray) -> int:
    """-1 if ascending-sorted, else first violating index (threaded)."""
    L = lib()
    if L is None:
        bad = np.nonzero(keys[:-1] > keys[1:])[0]
        return int(bad[0]) if len(bad) else -1
    a = np.ascontiguousarray(keys, np.uint64)
    return int(L.rt_verify_sorted_u64(_p64(a), a.shape[0]))


def compare_u64(a: np.ndarray, b: np.ndarray) -> int:
    """-1 if bit-identical, else first differing index (threaded)."""
    L = lib()
    if L is None:
        bad = np.nonzero(a != b)[0]
        return int(bad[0]) if len(bad) else -1
    aa = np.ascontiguousarray(a, np.uint64)
    bb = np.ascontiguousarray(b, np.uint64)
    return int(L.rt_compare_u64(_p64(aa), _p64(bb), aa.shape[0]))


def kway_merge_u32(runs, vruns=None, out=None, vout=None):
    """Stable threaded k-way merge of ascending u32 runs (the host half of
    the external sort). Equal keys keep run order (run-major), so merging
    device-sorted chunks preserves global stability.

    runs: list of ascending np.uint32 arrays. vruns: optional matching list
    of u32-viewable payload arrays. Returns merged keys (and payloads).
    out / vout: optional preallocated u32 destinations (e.g. np.memmap for
    the disk-spill external sort) — the merge writes through them.
    """
    import ctypes as ct

    runs = [np.ascontiguousarray(r, np.uint32) for r in runs]
    k = len(runs)
    n = int(sum(r.shape[0] for r in runs))
    if vruns is not None:
        if len(vruns) != k:
            raise ValueError("one payload run per key run")
        vruns = [np.ascontiguousarray(v).view(np.uint32) for v in vruns]
        for r, v in zip(runs, vruns):
            if v.shape[0] != r.shape[0]:
                raise ValueError("payload run length mismatch")
    if out is not None and (out.dtype != np.uint32 or out.shape[0] != n):
        raise ValueError(f"out must be uint32[{n}]")
    if vout is not None and (vout.dtype != np.uint32
                             or vout.shape[0] != n):
        raise ValueError(f"vout must be uint32[{n}]")
    L = lib()
    if L is None:  # pure-numpy fallback: stable argsort of the concat
        ck = np.concatenate(runs) if k else np.empty(0, np.uint32)
        perm = np.argsort(ck, kind="stable")
        mk = ck[perm]
        if out is not None:
            out[:] = mk
            mk = out
        if vruns is None:
            return mk
        mv = np.concatenate(vruns)[perm] if k else np.empty(0, np.uint32)
        if vout is not None:
            vout[:] = mv
            mv = vout
        return mk, mv
    if out is None:
        out = np.empty(n, np.uint32)
    u32p = ct.POINTER(ct.c_uint32)
    run_ptrs = (u32p * k)(*[_p32(r) for r in runs])
    lens = (ct.c_int64 * k)(*[r.shape[0] for r in runs])
    if vruns is None:
        L.rt_kway_merge_u32(run_ptrs, lens, k, n, _p32(out),
                            ct.cast(None, ct.POINTER(u32p)),
                            ct.cast(None, u32p))
        return out
    if vout is None:
        vout = np.empty(n, np.uint32)
    vptrs = (u32p * k)(*[_p32(v) for v in vruns])
    L.rt_kway_merge_u32(run_ptrs, lens, k, n, _p32(out), vptrs, _p32(vout))
    return out, vout
