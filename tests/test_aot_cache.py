"""AOT executable cache (utils/aot.py): build → persist → reload round trip,
key invalidation, and graceful fallback on corrupt payloads."""
import logging

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cm3p_tpu.utils.aot import AotFunctionCache, source_fingerprint


def _fn():
    @jax.jit
    def f(w, x):
        return jnp.tanh(x @ w).sum(axis=-1)

    return f


W = np.ones((16, 16), np.float32)
X = np.full((4, 16), 0.5, np.float32)


class TestAotCache:
    def test_build_then_reload(self, tmp_path, caplog):
        cache = AotFunctionCache(tmp_path, extra_key="k", allow_cpu=True)
        with caplog.at_level(logging.INFO, logger="cm3p_tpu.utils.aot"):
            out1 = np.asarray(cache.wrap(_fn(), "f")(W, X))
        files = list(tmp_path.glob("f-*.aotx"))
        # CPU executables may refuse serialization on some jaxlib builds —
        # then the wrapper must still produce correct results via plain jit
        if not files:
            assert any("using plain jit" in r.message for r in caplog.records)
            pytest.skip("backend does not support executable serialization")
        # a fresh cache instance (fresh process stand-in) must LOAD, not build
        cache2 = AotFunctionCache(tmp_path, extra_key="k", allow_cpu=True)
        with caplog.at_level(logging.INFO, logger="cm3p_tpu.utils.aot"):
            caplog.clear()
            out2 = np.asarray(cache2.wrap(_fn(), "f")(W, X))
        assert any("AOT cache hit" in r.message for r in caplog.records)
        np.testing.assert_array_equal(out1, out2)

    def test_distinct_shapes_distinct_entries(self, tmp_path):
        cache = AotFunctionCache(tmp_path, allow_cpu=True)
        wrapped = cache.wrap(_fn(), "f")
        wrapped(W, X)
        if not list(tmp_path.glob("*.aotx")):
            pytest.skip("backend does not support executable serialization")
        wrapped(W, np.full((8, 16), 0.5, np.float32))
        assert len(list(tmp_path.glob("*.aotx"))) == 2

    def test_extra_key_invalidates(self, tmp_path):
        a = AotFunctionCache(tmp_path, extra_key="a")
        b = AotFunctionCache(tmp_path, extra_key="b")
        assert a._path("f", (W, X)) != b._path("f", (W, X))

    def test_corrupt_payload_falls_back(self, tmp_path, caplog):
        cache = AotFunctionCache(tmp_path, allow_cpu=True)
        path = cache._path("f", (W, X))
        path.write_bytes(b"not a pickle")
        with caplog.at_level(logging.WARNING, logger="cm3p_tpu.utils.aot"):
            out = np.asarray(cache.wrap(_fn(), "f")(W, X))
        np.testing.assert_allclose(out, np.asarray(_fn()(W, X)))
        assert any("failed" in r.message for r in caplog.records)

    def test_cpu_backend_gated_off_by_default(self, tmp_path):
        """Cross-process CPU AOT executables can hang (machine-feature
        mismatch in the XLA:CPU loader) — production wrap must be a no-op
        on the CPU backend unless a test opts in."""
        import jax

        if jax.default_backend() != "cpu":
            pytest.skip("CPU-backend gating test")
        f = _fn()
        cache = AotFunctionCache(tmp_path)
        wrapped = cache.wrap(f, "f")
        assert wrapped is f
        np.asarray(wrapped(W, X))
        assert not list(tmp_path.glob("*.aotx"))

    def test_seed_dir_hit(self, tmp_path, caplog, monkeypatch):
        """A pre-built artifact shipped in a read-only seed dir (CM3P_AOT_SEED)
        must serve a fresh empty primary cache without rebuilding."""
        seed = tmp_path / "seed"
        AotFunctionCache(seed, extra_key="k", allow_cpu=True).wrap(_fn(), "f")(W, X)
        if not list(seed.glob("f-*.aotx")):
            pytest.skip("backend does not support executable serialization")
        primary = tmp_path / "primary"
        monkeypatch.setenv("CM3P_AOT_SEED", str(seed))
        cache = AotFunctionCache(primary, extra_key="k", allow_cpu=True)
        with caplog.at_level(logging.INFO, logger="cm3p_tpu.utils.aot"):
            out = np.asarray(cache.wrap(_fn(), "f")(W, X))
        assert any("AOT cache hit" in r.message and "seed" in r.message for r in caplog.records)
        assert not list(primary.glob("*.aotx"))  # served read-only, no rebuild
        np.testing.assert_allclose(out, np.asarray(_fn()(W, X)))

    def test_seed_corrupt_falls_through_to_build(self, tmp_path, monkeypatch):
        seed = tmp_path / "seed"
        seed.mkdir()
        monkeypatch.setenv("CM3P_AOT_SEED", str(seed))
        primary = tmp_path / "primary"
        cache = AotFunctionCache(primary, extra_key="k", allow_cpu=True)
        (seed / cache._path("f", (W, X)).name).write_bytes(b"junk")
        out = np.asarray(cache.wrap(_fn(), "f")(W, X))
        np.testing.assert_allclose(out, np.asarray(_fn()(W, X)))

    def test_source_fingerprint_stable(self):
        assert source_fingerprint() == source_fingerprint()
        assert len(source_fingerprint()) == 16

    def test_manifest_preload_round_trip(self, tmp_path, caplog):
        """A prior run's loads land in the manifest; preload() deserializes
        them in the background and wrap() consumes without a disk load."""
        cache = AotFunctionCache(tmp_path, extra_key="k", allow_cpu=True)
        np.asarray(cache.wrap(_fn(), "f")(W, X))
        if not list(tmp_path.glob("f-*.aotx")):
            pytest.skip("backend does not support executable serialization")
        manifest = list(tmp_path.glob("manifest-*.txt"))
        assert manifest and manifest[0].read_text().strip()

        fresh = AotFunctionCache(tmp_path, extra_key="k", allow_cpu=True)
        fresh.preload()
        path = fresh._path("f", (W, X))
        exe = fresh._take_preloaded(path)  # joins the background thread
        assert exe is not None
        with caplog.at_level(logging.INFO, logger="cm3p_tpu.utils.aot"):
            caplog.clear()
            out = np.asarray(fresh.wrap(_fn(), "f")(W, X))
        assert not any("AOT cache hit" in r.message for r in caplog.records)
        np.testing.assert_allclose(out, np.asarray(_fn()(W, X)))

    def test_preload_missing_manifest_is_noop(self, tmp_path):
        cache = AotFunctionCache(tmp_path, extra_key="nothing", allow_cpu=True)
        cache.preload()  # must not raise
        assert cache._take_preloaded(cache._path("f", (W, X))) is None

    def test_manifest_caps_and_dedups(self, tmp_path):
        cache = AotFunctionCache(tmp_path, extra_key="k", allow_cpu=True)
        for i in range(12):
            cache._manifest_record(tmp_path / f"f-{i:03d}.aotx")
        cache._manifest_record(tmp_path / "f-011.aotx")  # re-use keeps one entry
        names = cache._manifest_path().read_text().split()
        assert len(names) == 8
        assert names[-1] == "f-011.aotx" and names.count("f-011.aotx") == 1
