"""Native (ctypes) kernel for the faithful Funk-SGD inner loop.

The reference trains SVD in C (``recathon.c:2699-2940``): a strictly
sequential per-event SGD with C ``float`` arithmetic. An interpreted
Python replica is ~10^4x slower, which forced round-1 to run reduced
constants (features=8, epochs=2) — neither faithful nor fast. This
module compiles the identical loop with the system C compiler at first
use (stdlib ``ctypes`` + ``gcc``; no third-party dependency) so the
reference constants (50 features x 100 epochs, ``recathon.c:2707,
2788``) run in seconds at the harness scales.

The C source below is an original re-expression of the loop SEMANTICS
documented in operators/svd.py (epochs-outer/features-inner, residual
cache, baseline-seeded first step, full trailing-feature dot product,
float32 accumulation) — not copied code; the reference interleaves
this logic with PostgreSQL SPI plumbing.

If no C compiler is available the caller falls back to the pure-Python
loop (same semantics, reduced constants recommended).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile
from typing import Optional

import numpy as np

_C_SOURCE = r"""
#include <stdint.h>

/* Faithful Funk-SGD (recathon.c:2699-2940 semantics, float32).
   uf: num_features x n_u (row-major), itf: num_features x n_i.
   baseline[e] = item_avg[item[e]] + user_off[user[e]] seeds the very
   first (epoch 0, feature 0) error; residual caches the dot product
   over already-trained features. */
void funk_sgd_train(int64_t n_e, int64_t n_u, int64_t n_i,
                    const int32_t *u_idx, const int32_t *i_idx,
                    const float *vals, const float *baseline,
                    float *uf, float *itf, float *residual,
                    int32_t num_features, int32_t num_epochs,
                    float lr, float pen)
{
    for (int32_t j = 0; j < num_epochs; j++) {
        for (int32_t i = 0; i < num_features; i++) {
            float *uv = uf + (int64_t)i * n_u;
            float *iv = itf + (int64_t)i * n_i;
            for (int64_t e = 0; e < n_e; e++) {
                const int32_t u = u_idx[e];
                const int32_t it = i_idx[e];
                float err;
                if (i == 0 && j == 0) {
                    err = vals[e] - baseline[e];
                } else {
                    /* predictRating: rating STARTS at the residual of
                       earlier features (0 when i==0 — the reference
                       resets it each epoch) and accumulates the
                       current+trailing feature products onto it, in
                       that order — the float32 rounding sequence is
                       bit-identical to recathon.c:2680-2690 */
                    float acc = (i > 0) ? residual[e] : 0.0f;
                    for (int32_t f2 = i; f2 < num_features; f2++)
                        acc += uf[(int64_t)f2 * n_u + u]
                             * itf[(int64_t)f2 * n_i + it];
                    err = vals[e] - acc;
                }
                const float temp = uv[u];
                uv[u] += lr * (err * iv[it] - pen * uv[u]);
                iv[it] += lr * (err * temp - pen * iv[it]);
                if (i == 0)
                    residual[e] = uv[u] * iv[it];
                else
                    residual[e] += uv[u] * iv[it];
            }
        }
    }
}
"""

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _cache_dir() -> str:
    """Per-user 0700 cache dir for compiled kernels. NOT the shared
    temp dir: a world-writable location with a predictable
    content-addressed name would let any local user pre-plant a .so
    that CDLL then loads into the driver. The dir is created 0700 and
    verified to be owned by us and non-writable by others before any
    pre-existing artifact is trusted."""
    base = os.environ.get("XDG_CACHE_HOME",
                          os.path.join(os.path.expanduser("~"), ".cache"))
    d = os.path.join(base, "recdb_spark_native")
    os.makedirs(d, mode=0o700, exist_ok=True)
    st = os.stat(d)
    if st.st_uid != os.getuid() or (st.st_mode & 0o022):
        raise RuntimeError(f"unsafe native cache dir {d!r}: "
                           "not owned by us or group/other-writable")
    return d


def _compile() -> Optional[ctypes.CDLL]:
    """Compile the kernel into a content-addressed .so under the
    per-user cache dir; reuse across sessions. The .so is written via
    mkstemp + os.rename so concurrent first-use compiles never race a
    half-written object into CDLL. Returns None when no compiler."""
    tag = hashlib.md5(_C_SOURCE.encode()).hexdigest()[:16]
    cache = _cache_dir()
    so_path = os.path.join(cache, f"funk_sgd_{tag}.so")
    if not os.path.exists(so_path):
        src_fd, src = tempfile.mkstemp(suffix=".c", dir=cache)
        with os.fdopen(src_fd, "w") as f:
            f.write(_C_SOURCE)
        out_fd, out_tmp = tempfile.mkstemp(suffix=".so", dir=cache)
        os.close(out_fd)
        try:
            for cc in ("cc", "gcc", "clang"):
                try:
                    # -ffp-contract=off: no FMA fusion — every float32
                    # operation rounds individually, matching both the
                    # reference's pre-FMA-era build and the Python
                    # replica the parity test compares against
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
    fn = lib.funk_sgd_train
    fn.restype = None
    fn.argtypes = [
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int32, ctypes.c_int32, ctypes.c_float, ctypes.c_float,
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


def train(u_idx: np.ndarray, i_idx: np.ndarray, vals: np.ndarray,
          baseline: np.ndarray, n_u: int, n_i: int,
          num_features: int, num_epochs: int,
          lr: float, pen: float) -> tuple[np.ndarray, np.ndarray]:
    """Run the native kernel; returns (uf, itf) float32 factor matrices
    shaped (num_features, n_u) / (num_features, n_i), both initialized
    to the reference's 0.1 (recathon.c:2744,2751)."""
    if not available():
        raise RuntimeError("no C compiler available for the SGD kernel")
    n_e = len(vals)
    u32 = np.ascontiguousarray(u_idx, dtype=np.int32)
    i32 = np.ascontiguousarray(i_idx, dtype=np.int32)
    v32 = np.ascontiguousarray(vals, dtype=np.float32)
    b32 = np.ascontiguousarray(baseline, dtype=np.float32)
    uf = np.full((num_features, n_u), np.float32(0.1), dtype=np.float32)
    itf = np.full((num_features, n_i), np.float32(0.1), dtype=np.float32)
    residual = np.zeros(n_e, dtype=np.float32)
    p = lambda a, t: a.ctypes.data_as(ctypes.POINTER(t))  # noqa: E731
    _lib.funk_sgd_train(
        n_e, n_u, n_i, p(u32, ctypes.c_int32), p(i32, ctypes.c_int32),
        p(v32, ctypes.c_float), p(b32, ctypes.c_float),
        p(uf, ctypes.c_float), p(itf, ctypes.c_float),
        p(residual, ctypes.c_float),
        num_features, num_epochs,
        ctypes.c_float(lr), ctypes.c_float(pen))
    return uf, itf
