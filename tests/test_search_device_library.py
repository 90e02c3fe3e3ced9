"""Device-resident self-search through the public API (round-4 VERDICT
weak #1 / round-5 item 1).

``search(hashes, device_library=lib, library_paths=paths)`` must build
its Pallas sweep state straight from the resident packed rows of an
``IncrementalDeviceLibrary`` — no host packed matrix, no 128 B/hash h2d
re-upload — and replay the reference greedy semantics
(search_algorithm.rs:81-171) to the exact same groups as the upload
path.  These tests pin:

* group identity vs the naive greedy for arbitrary insertion order
  (device sort gather) and identity order (zero-copy buffer handoff);
* the host packed matrix is never built on the library path;
* forced windowed / split-window states through the attached library;
* ``seed()`` detaches the library (entries no longer covered).
"""

import numpy as np
import pytest

from vid_dup_finder_lib_tpu.ops import hamming_pallas as hp
from vid_dup_finder_lib_tpu.search import Search, search
from vid_dup_finder_lib_tpu.video_hash import VideoHash

from .test_search_synthetic import HashesWithDistanceSet, _named

TINY = hp.Geometry(tile_m=128, tile_n=256, r_tiles=1, band_tiles=2)


def _problem(seed=7, groups=3):
    rng = np.random.default_rng(seed)
    hashes = _named(HashesWithDistanceSet(groups, 40, 150, 50, rng)
                    .all_members(rng))
    hashes = [
        h.with_duration(int(d))
        for h, d in zip(hashes, rng.integers(10, 2000, len(hashes)))
    ]
    from vid_dup_finder_lib_tpu import TOLERANCE_SCALING_FACTOR

    return hashes, 120 / TOLERANCE_SCALING_FACTOR


def _library_for(hashes):
    """Library rows in the (unsorted) given order + their paths."""
    lib = hp.IncrementalDeviceLibrary()
    lib.append(np.stack([h.packed_u32() for h in hashes]))
    return lib, [h.src_path for h in hashes]


def test_public_search_device_library_matches_naive():
    hashes, tol = _problem()
    expected = search(hashes, tol, backend="naive")
    assert len(expected) >= 3  # the planted clusters actually match

    lib, paths = _library_for(hashes)
    got = search(
        hashes, tol, backend="pallas",
        device_library=lib, library_paths=paths,
    )
    assert got == expected


def test_device_library_skips_host_matrix(monkeypatch):
    """The whole point: the library path must never build (or upload)
    the host packed matrix."""
    hashes, tol = _problem(seed=11)
    expected = search(hashes, tol, backend="naive")

    def _boom(self):  # pragma: no cover - failure path
        raise AssertionError("host packed matrix built on library path")

    monkeypatch.setattr(Search, "_packed_matrix", _boom)
    lib, paths = _library_for(hashes)
    s = Search(hashes)
    s.attach_device_library(lib, paths)
    groups = s.search_self(tol, backend="pallas")
    got = [g for g in groups if len(g) >= 2]
    assert [sorted(g) for g in got] == [
        sorted(g.contained_paths()) for g in expected
    ]


def test_identity_order_zero_copy():
    """Rows appended pre-sorted (library_paths=None): the library buffer
    is handed to the sweep state zero-copy when capacity covers the
    padded tile grid."""
    hashes, tol = _problem(seed=13)
    expected = search(hashes, tol, backend="naive")

    entries = sorted(
        hashes,
        key=lambda h: (h.duration, h.src_path.encode()),
    )
    # capacity >= n_pad for the tiny geometry so state() can share
    lib = hp.IncrementalDeviceLibrary(capacity=1 << 14)
    lib.append(np.stack([h.packed_u32() for h in entries]))
    s = Search(hashes)
    s.attach_device_library(lib, None, geom=TINY)
    groups = s.search_self(tol, backend="pallas")
    assert lib._shared, "identity-order state was not zero-copy"
    got = [sorted(g) for g in groups if len(g) >= 2]
    assert got == [sorted(g.contained_paths()) for g in expected]


@pytest.mark.parametrize("backend", ["pallas_windowed", "pallas_split"])
def test_device_library_windowed_and_split(backend):
    """Forced windowed / split-window sweep states built from the
    attached library agree with the naive greedy."""
    hashes, tol = _problem(seed=17, groups=2)
    expected = search(hashes, tol, backend="naive")
    assert expected

    lib, paths = _library_for(hashes)
    s = Search(hashes)
    s.attach_device_library(lib, paths, geom=TINY)
    groups = s.search_self(tol, backend=backend)
    got = [sorted(g) for g in groups if len(g) >= 2]
    assert got == [sorted(g.contained_paths()) for g in expected]


def test_seed_detaches_library():
    hashes, tol = _problem(seed=19, groups=2)
    lib, paths = _library_for(hashes)
    s = Search(hashes[:-1])
    s.attach_device_library(lib, paths[:-1])
    s.seed([hashes[-1]])
    assert s._library is None and s._cands_dev is None
    # and the search still works (upload path)
    expected = search(hashes, tol, backend="naive")
    got = s.search_self(tol, backend="host")
    assert [sorted(g) for g in got if len(g) >= 2] == [
        sorted(g.contained_paths()) for g in expected
    ]


def test_state_sizing_matches_state_need():
    """library.state() must size by the STATE's packed need
    (windowed_need / split_need), so a capacity-matched library hands
    its buffer over without the constructor's pad concatenate (the
    transient that would double an 8.2 GB buffer at 64M)."""
    rng = np.random.default_rng(29)
    n = 2048
    packed = rng.integers(0, 2**32, (n, 32), dtype=np.uint64).astype(
        np.uint32
    )
    bounds = np.minimum(np.arange(n) + 700, n)
    order = np.arange(n, dtype=np.int64)

    for split, need in (
        (False, hp.windowed_need(n, bounds, geom=TINY)),
        (True, hp.split_need(n, bounds, geom=TINY)),
    ):
        lib = hp.IncrementalDeviceLibrary(capacity=need)
        lib.append(packed)
        st = lib.state(
            order, bounds, windowed=True, split=split, geom=TINY
        )
        assert st.packed_dev is lib._packed, (
            f"split={split}: state() forced a device copy"
        )
        assert lib._shared
