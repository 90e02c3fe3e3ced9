"""Windowed Pallas sweep: parity with the host banded sweep.

``WindowedPallasState`` keeps only the PACKED library device-resident and
unpacks a sliding +/-1 row window (the path for libraries whose int8
operand expansion exceeds HBM).  These tests assert pair-for-pair parity
against the host backend — including, via a tiny-tile subprocess run, a
configuration that forces many window rebuilds mid-sweep.
"""

import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _random_library(n: int, rng) -> tuple[np.ndarray, np.ndarray]:
    packed = rng.integers(0, 2**32, (n, 32), dtype=np.uint64).astype(
        np.uint32
    )
    packed[:, -1] &= np.uint32(0xFF)
    durations = np.sort(rng.integers(30, 7200, n))
    # plant duplicate pairs at shared durations (random pairs sit at
    # Hamming ~500 and never match at tolerance 350)
    for s in range(0, n - 1, max(1, n // 7)):
        h = packed[s].copy()
        for b in rng.choice(1000, 60, replace=False):
            h[b // 32] ^= np.uint32(1) << np.uint32(b % 32)
        packed[s + 1] = h
        durations[s + 1] = durations[s]
    bounds = np.searchsorted(
        durations,
        (durations.astype(np.float64) * 1.1).astype(np.int64),
        side="right",
    )
    return packed, bounds


def test_windowed_matches_host_single_window():
    from vid_dup_finder_lib_tpu.ops.hamming import banded_adjacency_host
    from vid_dup_finder_lib_tpu.ops.hamming_pallas import (
        WindowedPallasState,
        banded_adjacency_pallas,
    )

    rng = np.random.default_rng(5)
    packed, bounds = _random_library(700, rng)
    hi, hj = banded_adjacency_host(packed, bounds, 350)
    assert len(hi) > 0
    st = WindowedPallasState(packed, bounds)
    wi, wj = banded_adjacency_pallas(packed, bounds, 350, state=st)
    assert np.array_equal(hi, wi)
    assert np.array_equal(hj, wj)


def test_windowed_search_groups_match_host():
    from vid_dup_finder_lib_tpu.search import search
    from vid_dup_finder_lib_tpu.video_hash import VideoHash

    rng = np.random.default_rng(9)
    hashes = [VideoHash.random_hash(rng) for _ in range(220)]
    hashes = [
        h.with_src_path(f"/v/{i:04}").with_duration(int(d))
        for i, (h, d) in enumerate(
            zip(hashes, rng.integers(50, 400, len(hashes)))
        )
    ]
    # clone a few entries so real groups exist
    hashes[11] = (
        hashes[10].hash_with_spatial_distance(80, rng)
        .with_src_path("/v/0011").with_duration(hashes[10].duration)
    )
    hashes[101] = (
        hashes[100].hash_with_spatial_distance(40, rng)
        .with_src_path("/v/0101").with_duration(hashes[100].duration)
    )
    tol = 0.3
    expected = search(hashes, tol, backend="host")
    got = search(hashes, tol, backend="pallas_windowed")
    assert got == expected
    assert expected  # the planted clones must actually group


def test_incremental_library_windowed_state():
    """Appending rows then searching through a WINDOWED state must match
    the host sweep (the large-library flavor of the incremental path)."""
    from vid_dup_finder_lib_tpu.ops.hamming import banded_adjacency_host
    from vid_dup_finder_lib_tpu.ops.hamming_pallas import (
        IncrementalDeviceLibrary,
        banded_adjacency_pallas,
    )

    rng = np.random.default_rng(17)
    packed, bounds = _random_library(600, rng)
    lib = IncrementalDeviceLibrary(capacity=1024)
    lib.append(packed[:250])
    lib.append(packed[250:])
    # library rows are already duration-sorted here: identity order
    st = lib.state(np.arange(600), bounds, windowed=True)
    assert getattr(st, "windowed", False)
    hi, hj = banded_adjacency_host(packed, bounds, 350)
    wi, wj = banded_adjacency_pallas(None, bounds, 350, state=st)
    assert np.array_equal(hi, wi)
    assert np.array_equal(hj, wj)


_CHILD = r"""
import os, sys
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, sys.argv[1])
sys.path.insert(0, os.path.join(sys.argv[1], "tests"))
from vid_dup_finder_lib_tpu.ops.hamming import banded_adjacency_host
from vid_dup_finder_lib_tpu.ops import hamming_pallas as hp
from test_windowed import _random_library

assert (hp.TILE_M, hp.TILE_N, hp.BAND_TILES) == (128, 256, 2)
rng = np.random.default_rng(11)
packed, bounds = _random_library(3000, rng)
hi, hj = banded_adjacency_host(packed, bounds, 350)
assert len(hi) > 0
st = hp.WindowedPallasState(packed, bounds, window_rows=1)  # minimal window
wi, wj = hp.banded_adjacency_pallas(packed, bounds, 350, state=st)
assert np.array_equal(hi, wi), (hi[:20], wi[:20])
assert np.array_equal(hj, wj)
assert st.rebuilds >= 3, st.rebuilds
print(f"OK rebuilds={st.rebuilds} pairs={len(wi)}")
"""


def test_windowed_rebuilds_tiny_tiles():
    """Tiny tile geometry in a subprocess: the sweep must slide the window
    many times and still reproduce the host pairs exactly."""
    env = dict(os.environ)
    env.update(
        VDF_TILE_M="128",
        VDF_TILE_N="256",
        VDF_BAND_TILES="2",
        JAX_PLATFORMS="cpu",
    )
    out = subprocess.run(
        [sys.executable, "-c", _CHILD, REPO],
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "OK rebuilds=" in out.stdout
