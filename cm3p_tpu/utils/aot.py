"""Disk-backed ahead-of-time (AOT) executable cache for jitted entry points.

The persistent XLA compilation cache (utils/cache.py) makes repeat
*compiles* sub-second, but every fresh process still pays trace + lower —
~60 s of single-core Python for the packed extraction graph (measured
2026-08-19: flax module trace ~40 s + pallas kernel traces + pjit lower
~22 s per flush shape). ``jax.experimental.serialize_executable`` skips
all of it: the compiled executable is pickled to disk once, and warm
starts deserialize (~50 ms) and run without ever tracing Python.

Keying: executables are only valid for the exact program, so the cache
key hashes the jax/jaxlib versions, the device topology, a content hash
of every ``cm3p_tpu`` source file (plus caller-supplied extras: entry
script source, model config, gate env), and the flattened arg signature
(pytree structure + per-leaf shape/dtype). Any mismatch is a clean miss;
any load/serialize failure falls back to the plain jitted path with a
warning — the cache can never produce a wrong result, only a slower one.

No reference counterpart: the torch reference re-traces every run
(`extract_beatmap_embeddings.py` in /root/reference); this is TPU-side
operations tooling the reference has no equivalent of.
"""
from __future__ import annotations

import hashlib
import logging
import os
import pickle
import threading
import time
from pathlib import Path
from typing import Any, Callable

logger = logging.getLogger(__name__)

_FINGERPRINT: str | None = None


def source_fingerprint() -> str:
    """Content hash of the cm3p_tpu package sources (cached per process).

    A changed line anywhere in the package invalidates cached executables —
    coarse, but executables are cheap to rebuild and silent staleness is
    the one failure mode this cache must not have.
    """
    global _FINGERPRINT
    if _FINGERPRINT is None:
        import cm3p_tpu

        root = Path(cm3p_tpu.__file__).resolve().parent
        h = hashlib.sha256()
        for p in sorted(root.rglob("*.py")):
            h.update(p.as_posix().encode())
            h.update(p.read_bytes())
        _FINGERPRINT = h.hexdigest()[:16]
    return _FINGERPRINT


def _environment_key() -> str:
    import jax

    dev = jax.devices()
    return "|".join(
        [
            jax.__version__,
            getattr(jax, "jaxlib_version", ""),
            str(len(dev)),
            dev[0].device_kind if dev else "none",
            source_fingerprint(),
        ]
    )


def _args_signature(args: tuple) -> str:
    import jax

    flat, tree = jax.tree_util.tree_flatten(args)
    parts = [str(tree)]
    for leaf in flat:
        shape = getattr(leaf, "shape", None)
        dtype = getattr(leaf, "dtype", type(leaf).__name__)
        parts.append(f"{shape}:{dtype}")
    return ";".join(parts)


class AotFunctionCache:
    """Per-shape-signature executable cache around already-jitted functions.

    ``extra_key`` should carry everything program-relevant that lives
    outside the package sources and the arg avals: the entry script's own
    source, the model config, and performance-gate env values.
    """

    def __init__(self, directory: str | os.PathLike, extra_key: str = "",
                 allow_cpu: bool = False):
        self.dir = Path(directory)
        self.dir.mkdir(parents=True, exist_ok=True)
        self.extra_key = extra_key
        # Read-only seed directories (colon-separated env), consulted on a
        # primary-cache miss before building: lets a deploy ship pre-built
        # executables (``extract_beatmap_embeddings.py --prewarm`` output)
        # so the FIRST run on a fresh machine is already warm. Keys include
        # the package source fingerprint, so stale seeds are clean misses.
        self.seed_dirs = [
            Path(p) for p in os.environ.get("CM3P_AOT_SEED", "").split(":") if p
        ]
        # XLA:CPU AOT executables record compile-machine tuning features
        # (+prefer-no-scatter/-gather) that a fresh process's loader can't
        # match — the deserialized program then HANGS on real graphs
        # (measured 2026-08-19: the tiny-model extraction warm run stalled
        # 9+ min after "AOT cache hit"). The cache is for the TPU path;
        # CPU defaults to the plain jitted fn. ``allow_cpu`` exists for
        # unit tests exercising the mechanics on toy programs.
        self.allow_cpu = allow_cpu
        # Preload state: a manifest of the artifact filenames this exact
        # (environment, extra_key) configuration loaded or built before lets
        # ``preload()`` start deserializing them on a background thread at
        # job start — a warm extraction otherwise pays the ~10 s/executable
        # deserialize serially inside its first flush (r8 e2e: 21.5 s of the
        # 47 s warm wall), while the loader/relay waits it could hide behind
        # sit idle. Filenames already hash env+extra+shapes, so a manifest
        # entry can never resolve to a stale program — at worst a renamed
        # or deleted file is skipped.
        # keyed by artifact FILENAME (the content hash) — a preloaded seed-dir
        # artifact must serve a primary-dir lookup for the same program
        self._preloaded: dict[str, Any] = {}
        self._pending: dict[str, threading.Event] = {}
        self._plock = threading.Lock()

    def _path(self, name: str, args: tuple) -> Path:
        blob = "|".join([_environment_key(), self.extra_key, name, _args_signature(args)])
        return self.dir / f"{name}-{hashlib.sha256(blob.encode()).hexdigest()[:24]}.aotx"

    # ----------------------------------------------------------- manifest
    def _manifest_path(self) -> Path:
        key = hashlib.sha256(f"{_environment_key()}|{self.extra_key}".encode()).hexdigest()[:16]
        return self.dir / f"manifest-{key}.txt"

    def _manifest_record(self, path: Path) -> None:
        """Append ``path`` to the manifest (most-recent-last, unique, capped)."""
        try:
            mp = self._manifest_path()
            names = []
            if mp.exists():
                names = [n for n in mp.read_text().split() if n]
            names = [n for n in names if n != path.name] + [path.name]
            mp.write_text("\n".join(names[-8:]) + "\n")
        except OSError:  # manifest is an optimization, never an error source
            pass

    def preload(self) -> None:
        """Deserialize this configuration's previously used executables on a
        daemon thread, so the first ``wrap()`` call per shape finds them
        in memory instead of paying the deserialize on the critical path.
        Call after the backend is initialized (any ``jax.devices()`` works).
        No-op when there is no manifest yet or the backend is CPU-gated.
        """
        import jax

        if jax.default_backend() == "cpu" and not self.allow_cpu:
            return
        try:
            names = [n for n in self._manifest_path().read_text().split() if n]
        except OSError:
            return
        paths = []
        with self._plock:
            for name in reversed(names):  # most recent first
                for base in [self.dir] + self.seed_dirs:
                    p = base / name
                    if p.exists() and p.name not in self._pending and p.name not in self._preloaded:
                        self._pending[p.name] = threading.Event()
                        paths.append(p)
                        break
        if not paths:
            return

        def run():
            from jax.experimental import serialize_executable as se

            for p in paths:
                exe = None
                try:
                    t0 = time.perf_counter()
                    with open(p, "rb") as f:
                        payload, in_tree, out_tree = pickle.load(f)
                    exe = se.deserialize_and_load(payload, in_tree, out_tree)
                    logger.info(
                        "AOT preloaded %s (%.2fs, background)", p.name,
                        time.perf_counter() - t0,
                    )
                except Exception as err:
                    logger.warning("AOT preload of %s failed (%s); on-demand load will retry", p.name, err)
                with self._plock:
                    if exe is not None:
                        self._preloaded[p.name] = exe
                    self._pending.pop(p.name).set()

        threading.Thread(target=run, name="aot-preload", daemon=True).start()

    def _take_preloaded(self, path: Path):
        """Return a preloaded executable for ``path``'s program (keyed by
        filename, so a seed-dir preload serves a primary-dir lookup), waiting
        out an in-flight background deserialize of it; None on miss."""
        with self._plock:
            exe = self._preloaded.get(path.name)
            event = self._pending.get(path.name)
        if exe is not None or event is None:
            return exe
        event.wait()
        with self._plock:
            return self._preloaded.get(path.name)

    def wrap(self, jitted_fn: Callable, name: str) -> Callable:
        """Return a drop-in callable for ``jitted_fn`` (positional args only)."""
        import jax

        if jax.default_backend() == "cpu" and not self.allow_cpu:
            logger.info("AOT cache disabled on the CPU backend (see class docstring)")
            return jitted_fn
        loaded: dict[Path, Any] = {}

        def call(*args):
            path = self._path(name, args)
            exe = loaded.get(path)
            if exe is None:
                exe = self._take_preloaded(path)
                if exe is not None:
                    self._manifest_record(path)
                else:
                    exe = self._load_or_build(jitted_fn, name, path, args)
                loaded[path] = exe
            if exe is False:  # this signature is uncacheable; plain jit
                return jitted_fn(*args)
            try:
                return exe(*args)
            except Exception as err:  # input mismatch etc. — never fail the caller
                logger.warning("AOT call for %s failed (%s); using plain jit", name, err)
                loaded[path] = False
                return jitted_fn(*args)

        return call

    def _load_or_build(self, jitted_fn, name, path: Path, args):
        from jax.experimental import serialize_executable as se

        candidates = [path] + [d / path.name for d in self.seed_dirs]
        for cand in candidates:
            if not cand.exists():
                continue
            try:
                t0 = time.perf_counter()
                with open(cand, "rb") as f:
                    payload, in_tree, out_tree = pickle.load(f)
                exe = se.deserialize_and_load(payload, in_tree, out_tree)
                logger.info(
                    "AOT cache hit for %s at %s (%.2fs deserialize, skips trace+lower)",
                    name, cand, time.perf_counter() - t0,
                )
                self._manifest_record(path)
                return exe
            except Exception as err:
                logger.warning("AOT cache load for %s at %s failed (%s); %s",
                               name, cand, err,
                               "rebuilding" if cand == path else "trying next")
                if cand == path:
                    try:
                        path.unlink()
                    except OSError:
                        pass
        try:
            t0 = time.perf_counter()
            compiled = jitted_fn.lower(*args).compile()
            payload, in_tree, out_tree = se.serialize(compiled)
            tmp = path.with_suffix(f".tmp{os.getpid()}")
            with open(tmp, "wb") as f:
                pickle.dump((payload, in_tree, out_tree), f)
            os.replace(tmp, path)
            logger.info(
                "AOT cached %s (%.1fs build, %.1f MB)",
                name, time.perf_counter() - t0, len(payload) / 1e6,
            )
            self._manifest_record(path)
            return compiled
        except Exception as err:
            logger.warning("AOT build for %s failed (%s); using plain jit", name, err)
            return False
