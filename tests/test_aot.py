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


def test_aot_probe_and_auto_disable(tmp_path):
    """maybe_aot(probe=True) measures once, persists the verdict, and
    returns None (plain jit) on backends where deserialization loses."""
    import json

    from brepgen_tpu.sampling.aot import (
        deserialization_beats_compile,
        maybe_aot,
    )

    d = str(tmp_path / "cache")
    wins = deserialization_beats_compile(d)
    probe_file = tmp_path / "cache" / "backend_probe.json"
    assert probe_file.exists()
    with open(probe_file) as f:
        data = json.load(f)
    (entry,) = data.values()
    assert entry["wins"] == wins and entry["t_compile_s"] > 0
    # second call returns the persisted verdict (no re-measure: the file
    # content is unchanged even if timings would differ)
    before = probe_file.read_text()
    assert deserialization_beats_compile(d) == wins
    assert probe_file.read_text() == before

    cache = maybe_aot(d, probe=True)
    assert (cache is not None) == wins

    # forced losing verdict -> cache auto-disabled
    key = next(iter(data))
    data[key]["wins"] = False
    with open(probe_file, "w") as f:
        json.dump(data, f)
    assert maybe_aot(d, probe=True) is None
    assert maybe_aot(d, probe=False) is not None  # explicit opt-out keeps it


def test_aot_signature_distinguishes_shapes(tmp_path):
    cache = AotCache(str(tmp_path))
    k1 = cache._key("f", (jnp.zeros((2, 3)),), "")
    k2 = cache._key("f", (jnp.zeros((3, 2)),), "")
    k3 = cache._key("f", (jnp.zeros((2, 3), jnp.bfloat16),), "")
    assert len({k1, k2, k3}) == 3
