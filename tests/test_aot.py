"""AOT stage-executable caching (sampling/aot.py)."""

import glob

import jax
import jax.numpy as jnp
import numpy as np

from brepgen_tpu.sampling.aot import AotCache


def test_aot_wrap_correct_and_cached(tmp_path):
    cache = AotCache(str(tmp_path))

    calls = {"n": 0}

    @jax.jit
    def f(x):
        return x * 2.0 + 1.0

    wrapped = cache.wrap(f, "double", fingerprint="cfg1")
    x = jnp.arange(8.0)
    np.testing.assert_allclose(np.asarray(wrapped(x)), np.arange(8.0) * 2 + 1)
    del calls

    entries = glob.glob(str(tmp_path / "double-*.jaxexe"))
    if not entries:  # backend without executable serialization: fallback ran
        return

    # a fresh cache instance must LOAD (not recompile): corrupting the
    # lowering path is impossible to observe directly, so assert the loaded
    # executable computes the same thing and no new entry appears
    wrapped2 = AotCache(str(tmp_path)).wrap(f, "double", fingerprint="cfg1")
    np.testing.assert_allclose(np.asarray(wrapped2(x)), np.arange(8.0) * 2 + 1)
    assert glob.glob(str(tmp_path / "double-*.jaxexe")) == entries

    # a different fingerprint misses the cache
    wrapped3 = AotCache(str(tmp_path)).wrap(f, "double", fingerprint="cfg2")
    np.testing.assert_allclose(np.asarray(wrapped3(x)), np.arange(8.0) * 2 + 1)
    assert len(glob.glob(str(tmp_path / "double-*.jaxexe"))) == 2


def test_aot_signature_distinguishes_shapes(tmp_path):
    cache = AotCache(str(tmp_path))
    k1 = cache._key("f", (jnp.zeros((2, 3)),), "")
    k2 = cache._key("f", (jnp.zeros((3, 2)),), "")
    k3 = cache._key("f", (jnp.zeros((2, 3), jnp.bfloat16),), "")
    assert len({k1, k2, k3}) == 3
