"""Tests for schema, synthetic fixtures, padding, and stage assembly."""

import numpy as np
import pytest

from brepgen_tpu.data import pad_repeat, pad_zero, validate_brep
from brepgen_tpu.data.assembly import (
    assemble_edgepos,
    assemble_edgez,
    assemble_surf_uv,
    assemble_surfpos,
    assemble_surfz,
    filter_sample,
)
from brepgen_tpu.data.loader import Batcher
from brepgen_tpu.data.synthetic import make_cuboid, make_cylinder, make_dataset, make_prism


@pytest.fixture(scope="module")
def cuboid():
    return make_cuboid(1.0, 2.0, 0.5)


def test_synthetic_solids_are_schema_valid():
    for s in (make_cuboid(), make_prism(5), make_cylinder()):
        validate_brep(s)  # raises on violation


def test_cuboid_topology(cuboid):
    assert len(cuboid["surf_wcs"]) == 6
    assert len(cuboid["edge_wcs"]) == 12
    assert len(cuboid["corner_unique"]) == 8
    # every edge borders exactly two faces; mating duplication doubles edges
    total_face_edges = sum(len(a) for a in cuboid["faceEdge_adj"])
    assert total_face_edges == 2 * 12


def test_cylinder_split_faces():
    c = make_cylinder()
    assert len(c["surf_wcs"]) == 4  # two half-sides + two caps
    assert len(c["edge_wcs"]) == 6
    assert len(c["corner_unique"]) == 4


def test_normalization_invariants(cuboid):
    # solid spans the [-1,1] cube in the largest axis
    assert np.isclose(np.abs(cuboid["surf_wcs"]).max(), 1.0, atol=1e-6)
    # each face's ncs grid spans its own unit cube
    for grid in cuboid["surf_ncs"]:
        assert np.isclose(np.abs(grid).max(), 1.0, atol=1e-5)


def test_pad_repeat_and_zero():
    x = np.arange(10).reshape(5, 2).astype(float)
    r = pad_repeat(x, 12)
    assert r.shape == (12, 2)
    # every original row appears at least twice
    for row in x:
        assert (r == row).all(1).sum() >= 2
    z, mask = pad_zero(x, 8, return_mask=True)
    assert z.shape == (8, 2) and mask.tolist() == [False] * 5 + [True] * 3
    assert (z[5:] == 0).all()


def test_filter_sample(cuboid):
    assert filter_sample(cuboid, max_face=30, max_edge=20, bbox_scaled=3, threshold=0.05)
    assert not filter_sample(cuboid, max_face=5, max_edge=20, bbox_scaled=3, threshold=0.05)
    assert not filter_sample(cuboid, max_face=30, max_edge=3, bbox_scaled=3, threshold=0.05)
    # huge threshold -> everything looks duplicated -> rejected
    assert not filter_sample(cuboid, max_face=30, max_edge=20, bbox_scaled=3, threshold=10.0)


def test_assemble_shapes(cuboid):
    rng = np.random.default_rng(0)
    sp = assemble_surfpos(cuboid, rng, max_face=10)
    assert sp.shape == (10, 6)

    pos, ncs, mask = assemble_surfz(cuboid, rng, max_face=10)
    assert pos.shape == (10, 6) and ncs.shape == (10, 32, 32, 3)
    assert mask.sum() == 4  # 6 valid faces of 10

    epos, sncs, spos, smask = assemble_edgepos(cuboid, rng, max_face=10, max_edge=8)
    assert epos.shape == (10, 8, 6) and smask.sum() == 4

    encs, epos2, emask, sncs2, spos2, vpos = assemble_edgez(
        cuboid, rng, max_face=10, max_edge=8
    )
    assert encs.shape == (10, 8, 32, 3)
    assert emask.shape == (10, 8) and vpos.shape == (10, 8, 6)
    # each cuboid face has 4 edges -> 4 valid slots in each of 6 face rows
    assert (~emask).sum() == 6 * 4
    # padded face rows fully masked
    assert emask[6:].all()


def test_assemble_scaling(cuboid):
    rng = np.random.default_rng(0)
    pos, _, mask = assemble_surfz(cuboid, rng, max_face=10, bbox_scaled=3.0)
    valid = pos[~mask]
    assert np.abs(valid).max() <= 3.0 + 1e-5
    assert np.abs(valid).max() > 1.5  # actually scaled up


def test_vertex_pairs_lexsorted(cuboid):
    rng = np.random.default_rng(1)
    *_, vpos = assemble_edgez(cuboid, rng, max_face=10, max_edge=8)
    valid = vpos[0][:4].reshape(-1, 2, 3)
    for pair in valid:
        a, b = pair
        assert tuple(a) <= tuple(b)  # lexicographic order (x, then y, then z)


def test_assembly_deterministic(cuboid):
    a = assemble_edgez(cuboid, np.random.default_rng(42), max_face=10, max_edge=8)
    b = assemble_edgez(cuboid, np.random.default_rng(42), max_face=10, max_edge=8)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)


def test_batcher(cuboid):
    samples = make_dataset(10, seed=1)
    batcher = Batcher(
        samples,
        lambda d, rng: assemble_surfz(d, rng, max_face=12),
        batch_size=4,
        seed=0,
    )
    batches = list(batcher)
    assert len(batches) == 2
    pos, ncs, mask = batches[0]
    assert pos.shape == (4, 12, 6) and mask.shape == (4, 12)


def test_batcher_process_pool_matches_inprocess():
    """Worker-process assembly must be bit-identical to in-process assembly
    (same per-item seeds), and non-picklable assemble_fns must fall back."""
    import functools

    from brepgen_tpu.data.assembly import assemble_surfz as _asz

    samples = make_dataset(10, seed=1)
    asm = functools.partial(_asz, max_face=12)
    ref = list(Batcher(samples, asm, batch_size=4, seed=0))
    # clamp_to_cpus=False: the dev container has 1 core, which would
    # (correctly) disable the pool in production; the test wants the pool.
    pooled = Batcher(
        samples, asm, batch_size=4, seed=0, num_workers=2, clamp_to_cpus=False
    )
    assert pooled._pool is not None
    try:
        got = list(pooled)
    finally:
        pooled.close()
    assert len(got) == len(ref)
    for rb, gb in zip(ref, got):
        for x, y in zip(rb, gb):
            np.testing.assert_array_equal(x, y)

    with pytest.warns(UserWarning, match="not picklable"):
        fallback = Batcher(
            samples, lambda d, rng: asm(d, rng), batch_size=4, seed=0,
            num_workers=2, clamp_to_cpus=False,
        )
    assert fallback._pool is None


def test_surf_uv_aug_stays_normalized(cuboid):
    rng = np.random.default_rng(3)
    for _ in range(4):
        uv = assemble_surf_uv(cuboid, rng, aug=True)
        assert np.abs(uv).max() <= 1.0 + 1e-4


def test_prefetch_to_device(cuboid):
    import jax

    from brepgen_tpu.data.loader import prefetch_to_device

    batches = [
        {"x": np.ones((2, 3)) * i} for i in range(5)
    ]
    out = list(prefetch_to_device(iter(batches), lookahead=2))
    assert len(out) == 5
    assert isinstance(out[0]["x"], jax.Array)
    np.testing.assert_array_equal(np.asarray(out[3]["x"]), batches[3]["x"])


# ---------------------------------------------------------------------------
# vectorized whole-batch assembly (batch_assembly.py) vs per-sample golden


@pytest.mark.parametrize("aug", [False, True])
@pytest.mark.parametrize("stage", ["surfpos", "surfz", "edgepos", "edgez"])
def test_batched_assembly_matches_per_sample(stage, aug):
    """The vectorized batch path must reproduce the per-sample reference
    path for every (sample, seed): identical RNG draws, f32-round-off
    outputs, exact masks."""
    import functools

    from brepgen_tpu.data import batch_assembly as BA
    from brepgen_tpu.data import assembly as A

    samples = make_dataset(13, seed=3)
    seeds = np.random.default_rng(5).integers(0, 2**63 - 1, size=len(samples))
    kw = dict(max_face=12, bbox_scaled=3.0, aug=aug)
    ekw = dict(kw, max_edge=8)
    per_sample = {
        "surfpos": functools.partial(A.assemble_surfpos, **kw),
        "surfz": functools.partial(A.assemble_surfz, **kw),
        "edgepos": functools.partial(A.assemble_edgepos, **ekw),
        "edgez": functools.partial(A.assemble_edgez, **ekw),
    }[stage]
    batched = {
        "surfpos": functools.partial(BA.assemble_surfpos_batched, **kw),
        "surfz": functools.partial(BA.assemble_surfz_batched, **kw),
        "edgepos": functools.partial(BA.assemble_edgepos_batched, **ekw),
        "edgez": functools.partial(BA.assemble_edgez_batched, **ekw),
    }[stage]

    want_items = []
    for s, seed in zip(samples, seeds):
        out = per_sample(s, np.random.default_rng(seed))
        want_items.append(out if isinstance(out, tuple) else (out,))
    want = tuple(np.stack([it[k] for it in want_items])
                 for k in range(len(want_items[0])))
    got = batched(samples, seeds)

    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g.shape == w.shape and g.dtype == w.dtype
        if g.dtype == bool:
            np.testing.assert_array_equal(g, w)
        else:
            np.testing.assert_allclose(g, w, rtol=1e-5, atol=1e-6)


def test_batcher_batched_assembly_matches_per_sample():
    """Batcher with batch_assemble_fn yields the same epochs as the
    per-sample path (same seeds per item), including class labels."""
    import functools

    from brepgen_tpu.data import batch_assembly as BA

    samples = make_dataset(10, seed=1)
    labels = list(range(len(samples)))
    asm = functools.partial(assemble_surfz, max_face=12, aug=True)
    basm = functools.partial(BA.assemble_surfz_batched, max_face=12, aug=True)
    ref = list(Batcher(samples, asm, batch_size=4, seed=0, class_labels=labels))
    got = list(Batcher(samples, asm, batch_size=4, seed=0, class_labels=labels,
                       batch_assemble_fn=basm))
    assert len(got) == len(ref)
    for rb, gb in zip(ref, got):
        assert len(gb) == len(rb)
        for x, y in zip(rb, gb):
            if x.dtype == bool or x.dtype == np.int32:
                np.testing.assert_array_equal(y, x)
            else:
                np.testing.assert_allclose(y, x, rtol=1e-5, atol=1e-6)


def test_dedup_primitives_matches_reference_loop():
    """dedup_primitives reproduces the reference's surf/edge dedup exactly
    (deduplicate_surfedge.py:40-55: 6-bit real2bit, sha256 over the
    reshape(-1,3) bit grid, first occurrence kept, insertion order)."""
    from hashlib import sha256

    from brepgen_tpu.data.dedup import dedup_primitives, real2bit

    rng = np.random.default_rng(11)
    base_s = rng.uniform(-1, 1, (5, 32, 32, 3))
    base_e = rng.uniform(-1, 1, (4, 32, 3))
    samples = []
    for i in range(6):
        # mix exact repeats (drawn with replacement -> must dedup away)
        # with fresh primitives
        s = base_s[rng.integers(0, 5, 3)]
        e = base_e[rng.integers(0, 4, 2)]
        if i % 2:
            s = np.concatenate([s, rng.uniform(-1, 1, (1, 32, 32, 3))])
        samples.append({"surf_ncs": s, "edge_ncs": e})

    for kind, key in (("surface", "surf_ncs"), ("edge", "edge_ncs")):
        # reference transliteration (same traversal order)
        unique_hash, unique_data = set(), []
        for data in samples:
            arr = data[key]
            bits = real2bit(arr, n_bits=6)
            for np_bit, np_real in zip(bits, arr):
                h = sha256(np_bit.reshape(-1, 3).tobytes()).hexdigest()
                if h not in unique_hash:
                    unique_hash.add(h)
                    unique_data.append(np_real)
        want = np.stack(unique_data)
        got = dedup_primitives(samples, kind=kind, n_bits=6)
        assert len(want) < sum(len(s[key]) for s in samples)  # dedup happened
        np.testing.assert_array_equal(got, want)
