"""Regression tests for bench.py's host section and loops' replicating fetch.

Both pin advisor findings (round 4): (1) a missing native loader must not
drop the whole host-loader section from the bench artifact; (2) the
replicating identity used by `_fetch_global` must be cached per-mesh, not
re-jitted per validation batch (CLAUDE.md tunnel protocol: one dispatched
program per batch adds stall risk on the remote-compile path).
"""
import importlib.util
import os

import jax
import jax.numpy as jnp
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_bench():
    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(REPO, "bench.py"))
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


class TestHostLoaderRates:
    def test_native_unavailable_keeps_python_and_cached(self, monkeypatch):
        """bench_native returns None without the .so; the python/cached
        rates and their spreads must still appear (the pre-fix tuple
        unpacking raised and the outer except dropped everything)."""
        import speedplusbaseline_tpu.native as native_mod

        monkeypatch.setattr(native_mod, "native_available", lambda: False)
        bench = _load_bench()
        out = bench._host_loader_rates(n_images=6, passes=1)
        assert out is not None
        assert out["host_native_img_s_per_worker"] is None
        assert out["host_python_img_s_per_worker"] > 0
        assert out["host_cached_img_s_per_worker"] > 0
        assert "native" not in out["host_rate_spread"]
        assert set(out["host_rate_spread"]) == {"python", "cached"}
        # The inverted-expectation flag must not fire when native is absent.
        assert "host_native_lt_python" not in out


class TestReplicateFnCache:
    def test_same_mesh_reuses_jitted_program(self):
        from speedplusbaseline_tpu.engine.loops import _fetch_global, _replicate_fn
        from speedplusbaseline_tpu.parallel import batch_sharding, make_mesh

        mesh = make_mesh()
        assert _replicate_fn(mesh) is _replicate_fn(mesh)

        # And the fetch it backs returns the full global array.
        x = np.arange(8 * 3, dtype=np.float32).reshape(8, 3)
        sharded = jax.device_put(jnp.asarray(x), batch_sharding(mesh))
        fetched = _fetch_global({"x": sharded})
        np.testing.assert_array_equal(np.asarray(fetched["x"]), x)
