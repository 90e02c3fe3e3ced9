"""VideoHashBatch: bulk-constructed hash lists and the Search fast path.

``VideoHash.many_from_packed_u32`` returns a list subclass carrying the
vectorized columns it was built from (packed uint32[n, 32] matrix,
int64 durations, bytewise path array); the ``Search`` constructor uses
them directly — zero per-object Python work, pre-seeded packed-matrix
cache.  These tests pin that the fast path is output-identical to the
per-object path (the reference's Search::from sort semantics,
search_algorithm.rs:19-62) under every degradation: scrambled input,
duration ties, list mutation, non-ASCII paths.
"""

import numpy as np
import pytest

from vid_dup_finder_lib_tpu import VideoHash, VideoHashBatch, search
from vid_dup_finder_lib_tpu.search import Search, search_with_references
from vid_dup_finder_lib_tpu.video_hash import hashes_to_matrix


def _synth(n, rng, tie_every=4):
    """Packed matrix + paths + durations with deliberate duration ties."""
    packed = rng.integers(0, 2**32, size=(n, 32), dtype=np.uint64).astype(
        np.uint32
    )
    # zero the 24 trailing storage bits like real hashes (word 31 high bits)
    packed[:, 31] &= np.uint32(0x000000FF)
    durations = rng.integers(30, 30 + max(2, n // tie_every), size=n)
    paths = [f"/vids/{rng.integers(0, 10**9):09}.mp4" for _ in range(n)]
    return packed, paths, durations


def test_bulk_constructor_returns_batch_with_consistent_arrays():
    rng = np.random.default_rng(7)
    packed, paths, durs = _synth(257, rng)
    batch = VideoHash.many_from_packed_u32(packed, paths, durs)
    assert isinstance(batch, VideoHashBatch)
    assert isinstance(batch, list)
    assert len(batch) == 257
    assert batch.arrays_valid
    assert batch.packed_u32.dtype == np.uint32
    np.testing.assert_array_equal(batch.packed_u32, packed)
    np.testing.assert_array_equal(batch.durations, np.asarray(durs))
    assert batch.paths_bytes is not None
    # the columns describe the objects exactly
    for i in (0, 100, 256):
        assert batch[i].src_path == paths[i]
        assert batch[i].duration == int(durs[i])
        np.testing.assert_array_equal(
            batch[i].packed_u32(), packed[i]
        )
        assert batch.paths_bytes[i] == paths[i].encode()


def test_search_ctor_fast_path_matches_per_object_sort():
    rng = np.random.default_rng(11)
    packed, paths, durs = _synth(500, rng, tie_every=3)
    batch = VideoHash.many_from_packed_u32(packed, paths, durs)
    fast = Search(batch)
    slow = Search(list(batch))  # plain list: per-object path
    assert [e.src_path for e in fast.entries] == [
        e.src_path for e in slow.entries
    ]
    np.testing.assert_array_equal(fast._durations, slow._durations)
    # the pre-seeded packed matrix equals the per-object rebuild
    np.testing.assert_array_equal(
        fast._packed_matrix(), hashes_to_matrix(slow.entries)
    )


def test_sorted_batch_zero_copy_packed_matrix():
    rng = np.random.default_rng(13)
    packed, paths, durs = _synth(128, rng)
    order = np.lexsort(
        (np.array(paths, dtype=np.bytes_), np.asarray(durs))
    )
    batch = VideoHash.many_from_packed_u32(
        packed[order],
        [paths[i] for i in order],
        np.asarray(durs)[order],
    )
    s = Search(batch)
    # pre-sorted input: no reorder, the batch's matrix IS the cache
    assert s._packed_mat is batch.packed_u32
    assert [e.src_path for e in s.entries] == [paths[i] for i in order]


def test_mutated_batch_falls_back_and_stays_correct():
    rng = np.random.default_rng(17)
    packed, paths, durs = _synth(64, rng)
    batch = VideoHash.many_from_packed_u32(packed, paths, durs)
    extra = VideoHash.random_hash(rng).with_src_path("/vids/extra.mp4")
    batch.append(extra)
    assert not batch.arrays_valid
    s = Search(batch)
    expect = Search(list(batch))
    assert [e.src_path for e in s.entries] == [
        e.src_path for e in expect.entries
    ]
    np.testing.assert_array_equal(
        s._packed_matrix(), hashes_to_matrix(expect.entries)
    )


@pytest.mark.parametrize(
    "mutator",
    [
        lambda b, rng: b.sort(key=lambda h: h.src_path),
        lambda b, rng: b.reverse(),
        lambda b, rng: b.pop(),
        lambda b, rng: b.__setitem__(
            0, VideoHash.random_hash(rng).with_src_path("/vids/x.mp4")
        ),
        lambda b, rng: b.remove(b[3]),
        lambda b, rng: b.clear(),
    ],
)
def test_every_mutator_invalidates(mutator):
    rng = np.random.default_rng(19)
    packed, paths, durs = _synth(16, rng)
    batch = VideoHash.many_from_packed_u32(packed, paths, durs)
    assert batch.arrays_valid
    mutator(batch, rng)
    assert not batch.arrays_valid


def test_non_ascii_paths_fall_back_to_exact_key():
    rng = np.random.default_rng(23)
    packed, _, durs = _synth(40, rng)
    paths = [f"/vidéos/{i:03}_ü.mp4" for i in range(40)]
    batch = VideoHash.many_from_packed_u32(packed, paths, durs)
    assert batch.paths_bytes is None
    s = Search(batch)
    expect = Search(list(batch))
    assert [e.src_path for e in s.entries] == [
        e.src_path for e in expect.entries
    ]


def test_public_search_group_parity_batch_vs_list():
    """Planted duplicate clusters through public search(): identical
    MatchGroups whether hashes arrive as a batch or a plain list."""
    rng = np.random.default_rng(29)
    n, k = 300, 6
    packed, paths, durs = _synth(n, rng)
    durs = np.asarray(durs).copy()
    # plant k clusters of 3: identical rows, same duration
    for c in range(k):
        base = 10 + c * 40
        packed[base + 1] = packed[base]
        packed[base + 2] = packed[base]
        durs[base + 1] = durs[base]
        durs[base + 2] = durs[base]
    batch = VideoHash.many_from_packed_u32(packed, paths, durs)
    g_batch = search(batch, 0.05)
    g_list = search(list(batch), 0.05)
    key = lambda g: sorted(g.contained_paths())  # noqa: E731
    assert sorted(map(key, g_batch)) == sorted(map(key, g_list))
    assert len(g_batch) >= k


def test_public_refs_search_group_parity_batch_vs_list():
    rng = np.random.default_rng(31)
    n, r = 400, 8
    packed, paths, durs = _synth(n, rng)
    ref_rows = packed[:r].copy()
    ref_durs = np.asarray(durs)[:r].copy()
    cands = VideoHash.many_from_packed_u32(packed, paths, durs)
    refs = VideoHash.many_from_packed_u32(
        ref_rows, [f"/refs/{i:02}.mp4" for i in range(r)], ref_durs
    )
    g_batch = search_with_references(refs, cands, 0.02)
    g_list = search_with_references(list(refs), list(cands), 0.02)
    as_pairs = lambda gs: sorted(  # noqa: E731
        (g.reference, tuple(sorted(g.duplicates))) for g in gs
    )
    assert as_pairs(g_batch) == as_pairs(g_list)
    assert len(g_batch) == r  # every ref finds its identical candidate


def test_duration_tie_break_is_bytewise_path_order():
    rng = np.random.default_rng(37)
    packed, _, _ = _synth(6, rng)
    paths = ["/b.mp4", "/a.mp4", "/c.mp4", "/A.mp4", "/aa.mp4", "/a0.mp4"]
    durs = [100] * 6  # all tied: order is purely bytewise path
    batch = VideoHash.many_from_packed_u32(packed, paths, durs)
    s = Search(batch)
    assert [e.src_path for e in s.entries] == sorted(paths)


def test_empty_batch():
    batch = VideoHash.many_from_packed_u32(
        np.zeros((0, 32), np.uint32), [], []
    )
    assert isinstance(batch, VideoHashBatch)
    assert len(batch) == 0
    s = Search(batch)
    assert s.entries == []
    assert search(batch, 0.05) == []
