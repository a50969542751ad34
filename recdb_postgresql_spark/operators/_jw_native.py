"""Native (ctypes) batch kernel for Jaro-Winkler scoring.

The pure-Python scorer in ``operators/linkage._jaro_winkler_py`` is
the SEMANTICS reference (bit-verified against DuckDB/fuzzystrmatch),
but at ~8 us/pair it caps the rerank operator at ~10^5 pairs/core-sec
— a 100x-too-slow hot loop for million-pair candidate sets. This
module compiles the identical algorithm with the system C compiler at
first use (same stdlib-ctypes pattern, cache dir, and atomic-publish
safety as ``_svd_native``) and scores an Arrow batch's pairs in one
call over packed UTF-8 buffers: ~0.1 us/pair.

Byte-vs-codepoint: the C kernel compares BYTES. For ASCII strings
bytes == codepoints and the result is bit-identical to the Python
reference (asserted by tests/test_jaro_winkler.py's fuzz). Non-ASCII
pairs are routed to the Python path by ``score_pairs`` so the
operator's unicode-codepoint semantics hold everywhere; the kernel
also returns a -1 sentinel for strings beyond its 4096-byte stack cap
and those rows re-score in Python.

No C compiler -> ``available()`` is False and callers use the Python
loop (same results, slower).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile
from typing import Callable, Optional, Sequence

import numpy as np

from recdb_postgresql_spark.operators._svd_native import _cache_dir

_C_SOURCE = r"""
#include <stdint.h>

#define JW_CAP 4096

/* Jaro-Winkler, fuzzystrmatch/DuckDB semantics (see
   linkage._jaro_winkler_py): window floor(max/2)-1, FLOORED
   transpositions, both-empty = 0, boost only when jaro > 0.7.
   Division/addition order mirrors the Python reference exactly so
   -ffp-contract=off doubles are bit-identical. */
static double jaro_winkler_one(const uint8_t *s1, int64_t l1,
                               const uint8_t *s2, int64_t l2)
{
    if (l1 == 0 || l2 == 0) return 0.0;
    if (l1 > JW_CAP || l2 > JW_CAP) return -1.0; /* caller fallback */
    int64_t maxl = l1 > l2 ? l1 : l2;
    int64_t window = maxl / 2 - 1;
    if (window < 0) window = 0;
    uint8_t m1[JW_CAP];
    uint8_t m2[JW_CAP];
    for (int64_t i = 0; i < l1; i++) m1[i] = 0;
    for (int64_t j = 0; j < l2; j++) m2[j] = 0;
    int64_t matches = 0;
    for (int64_t i = 0; i < l1; i++) {
        int64_t lo = i - window; if (lo < 0) lo = 0;
        int64_t hi = i + window + 1; if (hi > l2) hi = l2;
        for (int64_t j = lo; j < hi; j++) {
            if (!m2[j] && s2[j] == s1[i]) {
                m1[i] = 1; m2[j] = 1; matches++; break;
            }
        }
    }
    if (matches == 0) return 0.0;
    int64_t half = 0, k = 0;
    for (int64_t i = 0; i < l1; i++) {
        if (m1[i]) {
            while (!m2[k]) k++;
            if (s1[i] != s2[k]) half++;
            k++;
        }
    }
    int64_t t = half / 2;
    double dm = (double)matches;
    double jaro = (dm / (double)l1 + dm / (double)l2
                   + (dm - (double)t) / dm) / 3.0;
    if (jaro <= 0.7) return jaro;
    int64_t pmax = l1 < l2 ? l1 : l2;
    if (pmax > 4) pmax = 4;
    int64_t prefix = 0;
    for (int64_t i = 0; i < pmax && s1[i] == s2[i]; i++) prefix++;
    return jaro + (double)prefix * 0.1 * (1.0 - jaro);
}

void jaro_winkler_batch(int64_t n,
                        const uint8_t *buf1, const int64_t *off1,
                        const uint8_t *buf2, const int64_t *off2,
                        double *out)
{
    for (int64_t i = 0; i < n; i++)
        out[i] = jaro_winkler_one(buf1 + off1[i], off1[i + 1] - off1[i],
                                  buf2 + off2[i], off2[i + 1] - off2[i]);
}
"""

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _compile() -> Optional[ctypes.CDLL]:
    tag = hashlib.md5(_C_SOURCE.encode()).hexdigest()[:16]
    cache = _cache_dir()
    so_path = os.path.join(cache, f"jaro_winkler_{tag}.so")
    if not os.path.exists(so_path):
        src_fd, src = tempfile.mkstemp(suffix=".c", dir=cache)
        with os.fdopen(src_fd, "w") as f:
            f.write(_C_SOURCE)
        out_fd, out_tmp = tempfile.mkstemp(suffix=".so", dir=cache)
        os.close(out_fd)
        try:
            for cc in ("cc", "gcc", "clang"):
                try:
                    subprocess.run([cc, "-O2", "-ffp-contract=off",
                                    "-shared", "-fPIC", src,
                                    "-o", out_tmp], check=True,
                                   capture_output=True, timeout=60)
                    os.rename(out_tmp, so_path)  # atomic publish
                    break
                except (OSError, subprocess.SubprocessError):
                    continue
            else:
                return None
        finally:
            for p in (src, out_tmp):
                try:
                    os.unlink(p)
                except OSError:
                    pass
    lib = ctypes.CDLL(so_path)
    fn = lib.jaro_winkler_batch
    fn.restype = None
    fn.argtypes = [
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_double),
    ]
    return lib


def available() -> bool:
    global _lib, _tried
    if not _tried:
        _tried = True
        try:
            _lib = _compile()
        except Exception:
            _lib = None
    return _lib is not None


def _pack(strs: Sequence[bytes]):
    offs = np.zeros(len(strs) + 1, dtype=np.int64)
    np.cumsum([len(s) for s in strs], out=offs[1:])
    buf = np.frombuffer(b"".join(strs), dtype=np.uint8) \
        if offs[-1] else np.zeros(1, dtype=np.uint8)
    return buf, offs


def score_pairs(a: Sequence, b: Sequence,
                py_fallback: Callable[[str, str], float]) -> np.ndarray:
    """Score len(a) string pairs; None on either side scores 0.0.
    ASCII pairs go through the C kernel (packed in one call); None,
    non-ASCII, and over-cap rows score via ``py_fallback``."""
    n = len(a)
    out = np.zeros(n, dtype=np.float64)
    nat, e1, e2 = [], [], []
    for i in range(n):
        x, y = a[i], b[i]
        if not (isinstance(x, str) and isinstance(y, str)):
            continue  # None -> 0.0
        if x.isascii() and y.isascii():
            nat.append(i)
            e1.append(x.encode())
            e2.append(y.encode())
        else:
            out[i] = py_fallback(x, y)
    if nat and available():
        buf1, off1 = _pack(e1)
        buf2, off2 = _pack(e2)
        res = np.empty(len(nat), dtype=np.float64)
        p = lambda arr, t: arr.ctypes.data_as(ctypes.POINTER(t))  # noqa: E731
        _lib.jaro_winkler_batch(
            len(nat),
            p(buf1, ctypes.c_uint8), p(off1, ctypes.c_int64),
            p(buf2, ctypes.c_uint8), p(off2, ctypes.c_int64),
            p(res, ctypes.c_double))
        over = res < 0  # beyond the C stack cap: re-score in Python
        for j in np.nonzero(over)[0]:
            res[j] = py_fallback(e1[j].decode(), e2[j].decode())
        out[np.asarray(nat)] = res
    elif nat:
        for j, i in enumerate(nat):
            out[i] = py_fallback(e1[j].decode(), e2[j].decode())
    return out
