"""Ahead-of-time stage compilation with on-disk executable caching.

ABC-scale cascade stages (S=4000 scans) hit multi-minute remote compiles
per process launch. ``AotCache`` wraps a jitted function so its compiled
executable is serialized to disk on first use (``jax.experimental.
serialize_executable``) and deserialized — skipping XLA entirely — on every
later process. The reference has no analogue (eager PyTorch recompiles
nothing, but also fuses nothing); this is the TPU-native answer to its
"load weights and go" startup (``sample.py:57-98``).

Cache keys cover the function name, abstract input signature, jax version,
backend/device kind, and a caller-provided fingerprint (e.g. the cascade
config), so stale executables can never be loaded.
"""

from __future__ import annotations

import hashlib
import os
import pickle
from typing import Any, Callable, Optional

import jax


def _signature(args) -> str:
    leaves, treedef = jax.tree.flatten(args)
    parts = [str(treedef)]
    for leaf in leaves:
        parts.append(f"{getattr(leaf, 'shape', ())}:{getattr(leaf, 'dtype', type(leaf))}")
    return "|".join(parts)


class AotCache:
    """Compile-once executable store for jitted stage functions."""

    def __init__(self, cache_dir: str):
        self.cache_dir = cache_dir
        os.makedirs(cache_dir, exist_ok=True)

    def _key(self, name: str, args, fingerprint: str) -> str:
        dev = jax.devices()[0]
        raw = "\n".join(
            [
                name,
                fingerprint,
                _signature(args),
                jax.__version__,
                jax.default_backend(),
                dev.device_kind,
            ]
        )
        return f"{name}-{hashlib.sha256(raw.encode()).hexdigest()[:16]}"

    def wrap(self, fn: Callable, name: str, fingerprint: str = "") -> Callable:
        """Returns fn' that loads/compiles-and-caches on first call.

        ``fn`` must already be jitted (or jittable — it will be jitted).
        Falls back to the plain jitted path if (de)serialization fails
        (e.g. a backend without executable serialization support).
        """
        jfn = fn if hasattr(fn, "lower") else jax.jit(fn)
        state: dict = {}

        def place(exe, args):
            # AOT executables pin their input shardings; uncommitted host
            # arrays must be placed explicitly (jit does this implicitly,
            # Compiled.__call__ does not). input_shardings[0] is a tuple
            # aligned with the positional args, each entry a pytree of
            # shardings matching that argument's structure.
            try:
                shardings = exe.input_shardings[0]
            except Exception:  # noqa: BLE001
                return args
            return tuple(
                jax.device_put(a, s) for a, s in zip(args, shardings)
            )

        def call(*args):
            # one executable per argument signature: segmented schedules
            # call the same wrapped program with a shorter remainder chunk
            sig = _signature(args)
            if sig not in state:
                state[sig] = self._load_or_compile(jfn, name, args, fingerprint)
            exe, loaded = state[sig]
            try:
                return exe(*place(exe, args))
            except Exception:  # noqa: BLE001
                if not loaded:
                    raise
                # a deserialized executable can be unusable on this host
                # (e.g. device-assignment mismatch on virtual CPU meshes):
                # recompile fresh and overwrite the cache entry
                print(f"aot: cached executable for {name} unusable here; recompiling")
                os.unlink(self._path(name, args, fingerprint))
                state[sig] = self._load_or_compile(jfn, name, args, fingerprint)
                exe, _ = state[sig]
                return exe(*place(exe, args))

        return call

    def _path(self, name, args, fingerprint):
        return os.path.join(self.cache_dir, self._key(name, args, fingerprint) + ".jaxexe")

    def _load_or_compile(self, jfn, name: str, args, fingerprint: str):
        """Returns (executable, was_loaded_from_disk)."""
        from jax.experimental.serialize_executable import (
            deserialize_and_load,
            serialize,
        )

        path = self._path(name, args, fingerprint)
        if os.path.exists(path):
            try:
                with open(path, "rb") as f:
                    payload, in_tree, out_tree = pickle.load(f)
                return deserialize_and_load(payload, in_tree, out_tree), True
            except Exception as e:  # noqa: BLE001 -- stale/corrupt cache entry
                print(f"aot: ignoring unloadable cache entry {path}: {e}")
                os.unlink(path)

        compiled = jfn.lower(*args).compile()
        try:
            payload, in_tree, out_tree = serialize(compiled)
            tmp = path + f".tmp{os.getpid()}"
            with open(tmp, "wb") as f:
                pickle.dump((payload, in_tree, out_tree), f)
            os.replace(tmp, path)
        except Exception as e:  # noqa: BLE001 -- serialization unsupported
            print(f"aot: executable not cacheable ({e}); compiled in-process only")
        return compiled, False


def deserialization_beats_compile(cache_dir: str, margin: float = 1.2) -> bool:
    """Measure ONCE per (backend, device kind, jax version) whether loading
    a serialized executable actually beats compiling it.

    On some backends it does not — the tunneled axon TPU deserializes a
    small program slower than it recompiles it (BASELINE.md: 250-410 s
    warm start vs ~150 s cold compile at ABC scale) — and a cache that
    loses must auto-disable rather than degrade startup. The verdict is
    persisted in ``<cache_dir>/backend_probe.json``.

    Timing details: outputs are synchronized by HOST FETCH (np.asarray),
    not ``block_until_ready`` — deserialized executables do not block
    under the latter on the axon backend; inputs are salted per process
    so server-side result caches cannot fake execution.
    """
    import json
    import time

    import numpy as np

    dev = jax.devices()[0]
    key = "-".join([jax.default_backend(), dev.device_kind, jax.__version__])
    path = os.path.join(cache_dir, "backend_probe.json")
    data: dict = {}
    if os.path.exists(path):
        try:
            with open(path) as f:
                data = json.load(f)
        except Exception:  # noqa: BLE001 -- corrupt probe file: re-measure
            data = {}
        if key in data:
            return bool(data[key]["wins"])

    import jax.numpy as jnp
    from jax.experimental.serialize_executable import (
        deserialize_and_load,
        serialize,
    )

    def probe(x):
        def body(c, _):
            return jnp.tanh(c @ c), ()

        c, _ = jax.lax.scan(body, x, None, length=8)
        return c

    rng = np.random.default_rng(int.from_bytes(os.urandom(8), "little"))
    x1 = jnp.asarray(rng.normal(size=(128, 128)), jnp.float32)
    x2 = jnp.asarray(rng.normal(size=(128, 128)), jnp.float32)

    t0 = time.perf_counter()
    compiled = jax.jit(probe).lower(x1).compile()
    np.asarray(compiled(x1))
    t_compile = time.perf_counter() - t0

    t_deser = float("inf")
    try:
        payload, in_tree, out_tree = serialize(compiled)
        t0 = time.perf_counter()
        exe = deserialize_and_load(payload, in_tree, out_tree)
        np.asarray(exe(x2))
        t_deser = time.perf_counter() - t0
        wins = t_deser <= t_compile * margin
    except Exception as e:  # noqa: BLE001 -- serialization unsupported
        print(f"aot probe: serialization unsupported here ({e})")
        wins = False

    data[key] = {
        "wins": wins,
        "t_compile_s": round(t_compile, 3),
        "t_deserialize_s": round(t_deser, 3) if np.isfinite(t_deser) else None,
    }
    os.makedirs(cache_dir, exist_ok=True)
    tmp = path + f".tmp{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump(data, f, indent=1)
    os.replace(tmp, path)
    verdict = (
        "enabled"
        if wins
        else "DISABLED (deserialization loses on this backend; plain jit)"
    )
    print(
        f"aot probe [{key}]: compile {t_compile:.2f}s vs deserialize "
        f"{t_deser:.2f}s -> AOT cache {verdict}"
    )
    return wins


def maybe_aot(cache_dir: Optional[str], probe: bool = False) -> Optional[AotCache]:
    """AotCache for ``cache_dir``, or None (plain jit) when no dir is given
    — or when ``probe=True`` and the one-time backend probe shows
    deserialization losing to compilation on this backend."""
    if not cache_dir:
        return None
    if probe and not deserialization_beats_compile(cache_dir):
        return None
    return AotCache(cache_dir)


def wrap_stage(cache: Optional[AotCache], fn: Callable, name: str, fingerprint: str = "") -> Callable:
    """No-op without a cache; AOT-wrapped with one."""
    if cache is None:
        return fn
    return cache.wrap(fn, name, fingerprint)
