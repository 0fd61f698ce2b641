"""Python bindings for the C++ analytics core.

Loads ``libcm3p_analytics.so`` via ctypes (auto-building with ``make`` on
first use); every function has a pure-numpy fallback with identical
semantics, mirroring the reference visualizer's JS fallbacks
(``worker_wasm.js:51-167``).
"""
from __future__ import annotations

import ctypes
import hashlib
import logging
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

logger = logging.getLogger(__name__)

_NATIVE_DIR = Path(__file__).parent
_LIB: Optional[ctypes.CDLL] = None
_LIB_FAILED = False


def _source_fingerprint(native_dir: Path) -> str:
    """sha256 over the build inputs (sources + Makefile), content-based.

    mtime comparisons are unreliable here: a ``git checkout`` stamps every
    file with the checkout time, so an edited ``.cpp`` restored from git can
    look *older* than a stale ``.so`` and silently run old native code.
    """
    h = hashlib.sha256()
    for src in sorted(list(native_dir.glob("*.cpp")) + [native_dir / "Makefile"]):
        if src.exists():
            h.update(src.name.encode())
            h.update(src.read_bytes())
    return h.hexdigest()


def _is_stale(native_dir: Path) -> bool:
    so = native_dir / "libcm3p_analytics.so"
    if not so.exists():
        return True
    fp_file = native_dir / ".build.fingerprint"
    if not fp_file.exists():
        return True
    return fp_file.read_text().strip() != _source_fingerprint(native_dir)


def _build(native_dir: Path) -> None:
    """Run ``make`` under an exclusive lock and record the source fingerprint."""
    # serialize concurrent builds (data-loader spawn workers all
    # import this module; parallel `make` into one .so corrupts it)
    import fcntl

    with open(native_dir / ".build.lock", "w") as lock:
        fcntl.flock(lock, fcntl.LOCK_EX)
        if not _is_stale(native_dir):  # another process built while we waited
            return
        fp = _source_fingerprint(native_dir)  # hash BEFORE the build: no TOCTOU
        subprocess.run(
            ["make", "-C", str(native_dir)], check=True, capture_output=True, timeout=240
        )
        (native_dir / ".build.fingerprint").write_text(fp + "\n")


def _load_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _LIB_FAILED
    if _LIB is not None or _LIB_FAILED:
        return _LIB
    so = _NATIVE_DIR / "libcm3p_analytics.so"
    if _is_stale(_NATIVE_DIR):
        try:
            _build(_NATIVE_DIR)
        except Exception as e:
            if not so.exists():
                logger.warning("native analytics build failed (%s); using numpy fallbacks", e)
                _LIB_FAILED = True
                return None
            logger.warning(
                "native analytics rebuild failed (%s); the existing binary does NOT match "
                "the current sources — using numpy fallbacks to avoid running stale code", e
            )
            _LIB_FAILED = True
            return None
    try:
        lib = ctypes.CDLL(str(so))
    except OSError as e:
        logger.warning("native analytics load failed (%s); using numpy fallbacks", e)
        _LIB_FAILED = True
        return None

    f32p = ctypes.POINTER(ctypes.c_float)
    i8p = ctypes.POINTER(ctypes.c_int8)
    u32p = ctypes.POINTER(ctypes.c_uint32)
    st = ctypes.c_size_t
    u32 = ctypes.c_uint32

    lib.cm3p_pca.argtypes = [f32p, st, st, u32, f32p]
    lib.cm3p_kmeans.argtypes = [f32p, st, st, st, u32, i8p]
    lib.cm3p_kmeans_parallel.argtypes = [f32p, st, st, st, u32, ctypes.c_int, i8p]
    lib.cm3p_normalize.argtypes = [f32p, st, st, f32p]
    lib.cm3p_normalize_parallel.argtypes = [f32p, st, st, ctypes.c_int, f32p]
    lib.cm3p_knn.argtypes = [f32p, st, st, st, st, u32p, f32p]
    lib.cm3p_knn.restype = st
    _LIB = lib
    return lib


def _as_f32(x: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(x, dtype=np.float32)


def _ptr(x: np.ndarray, typ):
    return x.ctypes.data_as(typ)


def native_available() -> bool:
    return _load_lib() is not None


# ---------------------------------------------------------------------- PCA


def calculate_pca(embeddings: np.ndarray, seed: int = 12345) -> np.ndarray:
    """Project (n, d) embeddings to 2-D via power-iteration PCA."""
    emb = _as_f32(embeddings)
    n, d = emb.shape
    if n == 0 or d == 0:
        return np.zeros((0, 2), np.float32)
    lib = _load_lib()
    if lib is not None:
        out = np.zeros((n, 2), np.float32)
        f32p = ctypes.POINTER(ctypes.c_float)
        lib.cm3p_pca(_ptr(emb, f32p), n, d, seed, _ptr(out, f32p))
        return out
    return _pca_numpy(emb, seed)


def _pca_numpy(emb: np.ndarray, seed: int) -> np.ndarray:
    # start vectors come from the SAME LCG chain as the C++ core and the JS
    # fallback (lcg_unit: state/2^32 - 0.5) so all three implementations
    # produce identical projections (visualizer golden-fixture contract)
    # plain python ints with an explicit mask: np.uint32 scalar arithmetic
    # would emit a RuntimeWarning per step on the intentional overflow
    state = int(seed if seed else 12345) & 0xFFFFFFFF

    def lcg_unit():
        nonlocal state
        state = (state * 1664525 + 1013904223) & 0xFFFFFFFF
        return float(state) / 4294967296.0

    centered = emb - emb.mean(axis=0)
    comps = []
    for c in range(2):
        ev = np.asarray([lcg_unit() - 0.5 for _ in range(emb.shape[1])], np.float32)
        ev /= np.linalg.norm(ev) + 1e-12
        for _ in range(8):
            nxt = centered.T @ (centered @ ev)
            mag = np.linalg.norm(nxt)
            if mag > 0:
                ev = nxt / mag
        if c == 1:
            ev -= (comps[0] @ ev) * comps[0]
            mag = np.linalg.norm(ev)
            if mag > 0:
                ev /= mag
        comps.append(ev)
    return np.stack([centered @ comps[0], centered @ comps[1]], axis=1).astype(np.float32)


# ------------------------------------------------------------------- kmeans


def calculate_kmeans(
    embeddings: np.ndarray, k: int, seed: int = 42, n_threads: int = 1
) -> np.ndarray:
    """Lloyd k-means labels (int8), max-distance init, <=10 iterations."""
    emb = _as_f32(embeddings)
    n, d = emb.shape
    if n == 0 or k == 0:
        return np.zeros(0, np.int8)
    lib = _load_lib()
    if lib is not None:
        labels = np.zeros(n, np.int8)
        f32p = ctypes.POINTER(ctypes.c_float)
        i8p = ctypes.POINTER(ctypes.c_int8)
        if n_threads > 1:
            lib.cm3p_kmeans_parallel(_ptr(emb, f32p), n, d, k, seed, n_threads, _ptr(labels, i8p))
        else:
            lib.cm3p_kmeans(_ptr(emb, f32p), n, d, k, seed, _ptr(labels, i8p))
        return labels
    return _kmeans_numpy(emb, k, seed)


def _kmeans_numpy(emb: np.ndarray, k: int, seed: int) -> np.ndarray:
    n, d = emb.shape
    state = np.uint32(seed)

    def lcg():
        nonlocal state
        state = np.uint32(state * np.uint32(1664525) + np.uint32(1013904223))
        return int(state)

    centroids = np.zeros((k, d), np.float32)
    centroids[0] = emb[lcg() % n]
    distances = np.full(n, np.inf, np.float32)
    for i in range(1, k):
        dist = ((emb - centroids[i - 1]) ** 2).sum(axis=1)
        distances = np.minimum(distances, dist)
        centroids[i] = emb[int(np.argmax(distances))]

    labels = np.zeros(n, np.int8)
    for it in range(10):
        d2 = ((emb[:, None, :] - centroids[None, :, :]) ** 2).sum(-1)
        new_labels = d2.argmin(axis=1).astype(np.int8)
        changed = int((new_labels != labels).sum())
        labels = new_labels
        if it > 0 and changed == 0:
            break
        for c in range(k):
            mask = labels == c
            if mask.any():
                centroids[c] = emb[mask].mean(axis=0)
    return labels


# ---------------------------------------------------------------- normalize


def normalize_vectors(embeddings: np.ndarray, n_threads: int = 1) -> np.ndarray:
    emb = _as_f32(embeddings)
    n, d = emb.shape
    lib = _load_lib()
    if lib is not None:
        out = np.zeros_like(emb)
        f32p = ctypes.POINTER(ctypes.c_float)
        if n_threads > 1:
            lib.cm3p_normalize_parallel(_ptr(emb, f32p), n, d, n_threads, _ptr(out, f32p))
        else:
            lib.cm3p_normalize(_ptr(emb, f32p), n, d, _ptr(out, f32p))
        return out
    norms = np.linalg.norm(emb, axis=1, keepdims=True)
    out = np.where(norms > 0, emb / np.maximum(norms, 1e-30), 0.0).astype(np.float32)
    return out


# ---------------------------------------------------------------------- kNN


def find_nearest_neighbors(
    normalized: np.ndarray, query_idx: int, n_neighbors: int
) -> tuple[np.ndarray, np.ndarray]:
    """Cosine-distance neighbors of row ``query_idx`` (indices, distances)."""
    emb = _as_f32(normalized)
    n, d = emb.shape
    if query_idx >= n or n < 2:
        return np.zeros(0, np.uint32), np.zeros(0, np.float32)
    lib = _load_lib()
    k = min(n_neighbors, n - 1)
    if lib is not None:
        indices = np.zeros(k, np.uint32)
        dists = np.zeros(k, np.float32)
        f32p = ctypes.POINTER(ctypes.c_float)
        u32p = ctypes.POINTER(ctypes.c_uint32)
        got = lib.cm3p_knn(_ptr(emb, f32p), n, d, query_idx, k, _ptr(indices, u32p), _ptr(dists, f32p))
        return indices[:got], dists[:got]
    dots = emb @ emb[query_idx]
    dist = 1.0 - dots
    dist[query_idx] = np.inf
    order = np.argpartition(dist, k - 1)[:k]
    order = order[np.argsort(dist[order])]
    return order.astype(np.uint32), dist[order].astype(np.float32)
