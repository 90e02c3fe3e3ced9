"""Regression tests for review findings (round 5): HBM-bounded
flat-to-chunked migration, shared-store ownership (scatter donation,
state handoff), attach_device_library identity-order validation,
chunked-candidate refs routing, and bulk-constructor length checks."""

import numpy as np
import pytest

from tests.test_split_window import _tiny_geom
from tests.test_windowed import _random_library


# VDF_MAX_ALLOC_GB such that a 1024-row flat buffer (131072 B) fits but
# growth soon crosses HALF the watermark (262144 B) and must migrate
_SMALL_WATERMARK_GB = str(524288 / 2**30)


def _planted(n, rng):
    """Distinct packed rows (row i carries i in word 0) + shuffled
    distinct durations, so any order misalignment is detectable."""
    packed = rng.integers(0, 2**32, (n, 32), dtype=np.uint64).astype(
        np.uint32
    )
    packed[:, 0] = np.arange(n, dtype=np.uint32)
    durations = rng.permutation(np.arange(100, 100 + n, dtype=np.int64))
    return packed, durations


def test_grow_migrates_at_half_watermark_d2d(monkeypatch):
    """Incremental growth crosses half the single-allocation watermark:
    the flat buffer migrates to a ChunkedPackedStore via chunk-sized
    d2d slices (flat source <= half the watermark), bit-exactly."""
    from vid_dup_finder_lib_tpu.ops.hamming_pallas import (
        ChunkedPackedStore,
        IncrementalDeviceLibrary,
    )

    monkeypatch.setenv("VDF_MAX_ALLOC_GB", _SMALL_WATERMARK_GB)
    monkeypatch.setenv("VDF_CHUNK_ROWS", "1024")
    rng = np.random.default_rng(71)
    packed, _ = _planted(3000, rng)

    lib = IncrementalDeviceLibrary(capacity=1024)
    assert not isinstance(lib._packed, ChunkedPackedStore)
    lib.append(packed[:1000])  # still flat (128000 B < 131072)
    assert not isinstance(lib._packed, ChunkedPackedStore)
    lib.append(packed[1000:])  # doubling to 4096 rows crosses half
    assert isinstance(lib._packed, ChunkedPackedStore)
    assert lib.n == 3000
    assert lib._cap == lib._packed.shape[0]
    got = lib._packed.take_rows(np.arange(3000))
    assert np.array_equal(got, packed)


def test_grow_migrates_big_flat_via_host_bounce(monkeypatch, caplog):
    """A flat buffer already past half the watermark (explicit large
    ctor capacity) migrates through the host — d2h chunk fetches, drop,
    re-upload — instead of a d2d path that would need ~2x flat bytes."""
    import logging

    from vid_dup_finder_lib_tpu.ops.hamming_pallas import (
        ChunkedPackedStore,
        IncrementalDeviceLibrary,
    )

    monkeypatch.setenv("VDF_MAX_ALLOC_GB", _SMALL_WATERMARK_GB)
    monkeypatch.setenv("VDF_CHUNK_ROWS", "1024")
    rng = np.random.default_rng(72)
    packed, _ = _planted(5000, rng)

    lib = IncrementalDeviceLibrary(capacity=3000)  # 384000 B flat: past half
    assert not isinstance(lib._packed, ChunkedPackedStore)
    lib.append(packed[:3000])
    with caplog.at_level(logging.WARNING):
        lib.append(packed[3000:])  # grow past ctor capacity
    assert isinstance(lib._packed, ChunkedPackedStore)
    assert any("through the host" in r.message for r in caplog.records)
    got = lib._packed.take_rows(np.arange(5000))
    assert np.array_equal(got, packed)


def test_scatter_rows_default_preserves_shared_views():
    """scatter_rows without donate=True is a functional update: a
    wrapper sharing the chunk list (the state()/append handoff pattern)
    keeps seeing the pre-scatter rows; donate=True (sole owner) lands
    the same values."""
    from vid_dup_finder_lib_tpu.ops.hamming_pallas import (
        ChunkedPackedStore,
    )

    rng = np.random.default_rng(73)
    flat = rng.integers(0, 2**32, (4096, 32), dtype=np.uint64).astype(
        np.uint32
    )
    store = ChunkedPackedStore.zeros(4096, 1024)
    store.set_rows(0, flat)
    shared = ChunkedPackedStore(list(store.chunks), store.chunk_rows)

    idx = np.array([5, 1023, 1024, 4000])
    rows = rng.integers(0, 2**32, (4, 32), dtype=np.uint64).astype(
        np.uint32
    )
    store.scatter_rows(idx, rows)  # non-donating default
    assert np.array_equal(store.take_rows(idx), rows)
    assert np.array_equal(shared.take_rows(idx), flat[idx])

    sole = ChunkedPackedStore.zeros(4096, 1024)
    sole.set_rows(0, flat)
    sole.scatter_rows(idx, rows, donate=True)
    assert np.array_equal(sole.take_rows(idx), rows)


def test_state_handoff_does_not_mutate_library_store(monkeypatch):
    """state() hands a chunked library's rows to the sweep state via a
    shallow-copied wrapper: the state ctor's slide-room extend_to must
    not grow the library's own store or stale its _cap."""
    from vid_dup_finder_lib_tpu.ops.hamming_pallas import (
        ChunkedPackedStore,
        IncrementalDeviceLibrary,
    )

    monkeypatch.setenv("VDF_MAX_ALLOC_GB", "0.0000001")
    monkeypatch.setenv("VDF_CHUNK_ROWS", "1024")
    rng = np.random.default_rng(74)
    n = 3000
    packed, bounds = _random_library(n, rng)
    lib = IncrementalDeviceLibrary(capacity=n)
    assert isinstance(lib._packed, ChunkedPackedStore)
    lib.append(packed)
    shape_before = lib._packed.shape[0]
    chunks_before = list(lib._packed.chunks)
    st = lib.state(
        np.arange(n), bounds, windowed=True, split=True,
        geom=_tiny_geom(),
    )
    assert st.packed_dev is not lib._packed
    assert lib._packed.shape[0] == shape_before
    assert lib._cap == lib._packed.shape[0]
    assert all(
        a is b for a, b in zip(lib._packed.chunks, chunks_before)
    )


def test_attach_identity_order_validations():
    """attach_device_library(insertion_paths=None): row-count mismatch
    and misaligned identity order (rows appended in the ORIGINAL
    unsorted input order) raise ValueError instead of sweeping wrong
    rows; a correctly pre-sorted append still attaches."""
    from vid_dup_finder_lib_tpu.ops.hamming_pallas import (
        IncrementalDeviceLibrary,
    )
    from vid_dup_finder_lib_tpu.search import Search
    from vid_dup_finder_lib_tpu.video_hash import VideoHash

    rng = np.random.default_rng(75)
    n = 64
    packed, durations = _planted(n, rng)
    hashes = VideoHash.many_from_packed_u32(
        packed, [f"/v/{i:04}.mp4" for i in range(n)], durations
    )

    s = Search(hashes)  # ctor re-sorts (shuffled durations)
    lib_short = IncrementalDeviceLibrary(capacity=n)
    lib_short.append(packed[: n - 1])
    with pytest.raises(ValueError, match="identity order"):
        s.attach_device_library(lib_short, None)

    lib_unsorted = IncrementalDeviceLibrary(capacity=n)
    lib_unsorted.append(packed)  # original order, NOT the entry sort
    with pytest.raises(ValueError, match="not appended in sorted"):
        s.attach_device_library(lib_unsorted, None)

    order = np.lexsort(
        (
            np.array([f"/v/{i:04}.mp4" for i in range(n)], np.bytes_),
            durations,
        )
    )
    lib_sorted = IncrementalDeviceLibrary(capacity=n)
    lib_sorted.append(packed[order])
    s.attach_device_library(lib_sorted, None)  # spot-check passes
    assert s._library is lib_sorted

    with pytest.raises(ValueError, match="no row in insertion_paths"):
        s2 = Search(hashes)
        s2.attach_device_library(
            lib_sorted, [f"/other/{i}.mp4" for i in range(n)]
        )


def test_refs_chunked_candidates_ignore_windowed_veto(monkeypatch):
    """A chunked candidate store must ride the windowed refs state even
    when VDF_REFS_WINDOWED=0 — the resident chunk loop cannot index a
    ChunkedPackedStore (round-5 review finding); groups must replay the
    plain host path."""
    from vid_dup_finder_lib_tpu.ops.hamming_pallas import (
        ChunkedPackedStore,
        IncrementalDeviceLibrary,
    )
    from vid_dup_finder_lib_tpu.search import search_with_references
    from vid_dup_finder_lib_tpu.video_hash import VideoHash

    rng = np.random.default_rng(76)
    n, r = 3000, 16
    packed = rng.integers(0, 2**32, (n, 32), dtype=np.uint64).astype(
        np.uint32
    )
    packed[:, -1] &= np.uint32(0xFF)
    durations = np.sort(rng.integers(100, 7200, n))
    cand_hashes = VideoHash.many_from_packed_u32(
        packed, [f"/v/{i:08}.mp4" for i in range(n)], durations
    )
    ref_hashes = []
    for k in range(r):
        j = int(rng.integers(0, n))
        h = packed[j].copy()
        for b in rng.choice(1000, 30, replace=False):
            h[b // 32] ^= np.uint32(1) << np.uint32(b % 32)
        ref_hashes.append(
            VideoHash.from_packed_u32(
                h, f"/r/{k:04}.mp4", int(durations[j])
            )
        )
    want = search_with_references(ref_hashes, list(cand_hashes), 0.35)

    monkeypatch.setenv("VDF_MAX_ALLOC_GB", "0.0000001")
    monkeypatch.setenv("VDF_CHUNK_ROWS", "1024")
    monkeypatch.setenv("VDF_REFS_WINDOWED", "0")  # veto must be ignored
    monkeypatch.setenv("VDF_REFS_WINDOW_ROWS", "512")
    lib = IncrementalDeviceLibrary(capacity=n)
    assert isinstance(lib._packed, ChunkedPackedStore)
    lib.append(packed)
    got = search_with_references(
        ref_hashes, cand_hashes, 0.35,
        device_library=lib, library_paths=None,
    )
    assert [(g.reference, sorted(g.duplicates)) for g in got] == [
        (g.reference, sorted(g.duplicates)) for g in want
    ]
    assert len(want) > 0


def test_many_from_packed_u32_length_mismatch():
    """Mismatched matrix/src_paths/durations lengths raise ValueError
    up front instead of zip-truncating hashes or dying mid-loop."""
    from vid_dup_finder_lib_tpu.video_hash import VideoHash

    m = np.zeros((4, 32), np.uint32)
    with pytest.raises(ValueError, match="must match"):
        VideoHash.many_from_packed_u32(
            m, [f"/v/{i}.mp4" for i in range(3)], [10] * 4
        )
    with pytest.raises(ValueError, match="must match"):
        VideoHash.many_from_packed_u32(
            m, [f"/v/{i}.mp4" for i in range(5)], [10] * 5
        )
    batch = VideoHash.many_from_packed_u32(
        m, [f"/v/{i}.mp4" for i in range(4)], [10] * 4
    )
    assert len(batch) == 4
