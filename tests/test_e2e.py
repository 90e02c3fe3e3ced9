"""End-to-end: decode -> hash -> search on generated fixture videos.

Reproduces the reference's bundled-video assertion shape: 6 clips in 2
scenes of 3 variants -> exactly 2 duplicate groups of 3
(``vid_dup_finder_lib/examples/example.rs:77-82``).
"""

import os

import numpy as np
import pytest

import vid_dup_finder_lib_tpu as vdf
from vid_dup_finder_lib_tpu.models.builder import (
    CreationOptions,
    VideoHashBuilder,
)

from .fixtures import make_fixture_videos

DATA_DIR = os.path.join(os.path.dirname(__file__), "data")


@pytest.fixture(scope="session")
def fixture_videos():
    return make_fixture_videos(DATA_DIR)


@pytest.fixture(scope="session")
def fixture_hashes(fixture_videos):
    builder = VideoHashBuilder()  # default opts: Letterbox cropdetect
    return [builder.hash(p) for p in fixture_videos]


def test_hashes_have_expected_metadata(fixture_videos, fixture_hashes):
    for p, h in zip(fixture_videos, fixture_hashes):
        assert h.src_path == p
        assert h.duration == 12  # 288 frames at 24 fps
        assert np.any(h.hash != 0)


def test_example_two_groups_of_three(fixture_hashes):
    """The reference example's e2e assertion (example.rs:77-82)."""
    groups = vdf.search(fixture_hashes, vdf.DEFAULT_SEARCH_TOLERANCE)
    assert len(groups) == 2, [g.duplicates for g in groups]
    assert sorted(len(g) for g in groups) == [3, 3]
    names = [
        sorted(os.path.basename(p)[0:3] for p in g.duplicates) for g in groups
    ]
    assert all(len(set(n)) == 1 for n in names)  # no cat/dog mixing


def test_search_with_references_e2e(fixture_hashes):
    cats = [h for h in fixture_hashes if "cat" in h.src_path]
    dogs = [h for h in fixture_hashes if "dog" in h.src_path]
    groups = vdf.search_with_references(
        [cats[0]], cats[1:] + dogs, vdf.DEFAULT_SEARCH_TOLERANCE
    )
    assert len(groups) == 1
    assert groups[0].reference == cats[0].src_path
    assert len(groups[0]) == 2


def test_cropdetect_none_still_groups_plain_variants(fixture_videos):
    """Without letterbox removal the .3 letterboxed variants drift, but the
    plain/bright pairs must still match."""
    builder = VideoHashBuilder.from_options(
        CreationOptions(cropdetect=vdf.Cropdetect.NONE)
    )
    hashes = [
        builder.hash(p)
        for p in fixture_videos
        if not p.endswith(".3.mp4")
    ]
    groups = vdf.search(hashes, vdf.DEFAULT_SEARCH_TOLERANCE)
    assert len(groups) == 2
    assert sorted(len(g) for g in groups) == [2, 2]


def test_device_hash_kernel_agrees_with_host(fixture_videos):
    """The batched device (JAX) DCT kernel and the golden host pipeline must
    produce near-identical hashes (f32 vs f64 sign flips only)."""
    from vid_dup_finder_lib_tpu.models.builder import prepare_frames
    from vid_dup_finder_lib_tpu.ops.hash_kernel import hash_cubes_device
    from vid_dup_finder_lib_tpu.ops.golden import hash_bits_golden

    opts = CreationOptions()
    cubes = np.stack(
        [prepare_frames(p, opts)[0] for p in fixture_videos]
    )
    dev = hash_cubes_device(cubes)
    for i in range(cubes.shape[0]):
        golden_bits = hash_bits_golden(cubes[i])
        dev_bits = (
            (dev[i][:, None] >> np.arange(32, dtype=np.uint32)) & 1
        ).reshape(-1)[: len(golden_bits)].astype(bool)
        mismatch = int((golden_bits != dev_bits).sum())
        assert mismatch <= 2, f"video {i}: {mismatch} sign flips"
