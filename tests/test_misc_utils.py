"""Compositing, modulo, native-backend, and pipeline tests."""

import numpy as np
import pytest

from vid_dup_finder_lib_tpu.ops.compositing import (
    grid_images_rgb,
    row_images,
    stack_images,
)
from vid_dup_finder_lib_tpu.utils.modulo import (
    modulo,
    wrapping_add,
    wrapping_sub,
)


def test_row_images():
    a = np.full((2, 3, 3), 10, np.uint8)
    b = np.full((4, 2, 3), 20, np.uint8)
    out = row_images([a, b])
    assert out.shape == (4, 5, 3)
    assert (out[:2, :3] == 10).all()
    assert (out[2:, :3] == 0).all()  # padding
    assert (out[:, 3:] == 20).all()


def test_stack_images():
    a = np.full((2, 3, 3), 10, np.uint8)
    b = np.full((1, 5, 3), 20, np.uint8)
    out = stack_images([a, b])
    assert out.shape == (3, 5, 3)


def test_grid():
    a = np.full((2, 2, 3), 1, np.uint8)
    out = grid_images_rgb([[a, a], [a]])
    assert out.shape == (4, 4, 3)


def test_modulo():
    # ported from modulo.rs:42-77's carousel arithmetic
    assert modulo(5, 3) == 2
    assert modulo(-1, 3) == 2
    assert wrapping_add(2, 1, 3) == 0
    assert wrapping_sub(0, 1, 3) == 2


def test_native_backend_search_parity():
    from vid_dup_finder_lib_tpu import VideoHash, search
    from vid_dup_finder_lib_tpu.native import available

    if not available():
        pytest.skip("no compiler for the native library")
    rng = np.random.default_rng(11)
    hashes = [
        VideoHash.random_hash(rng)
        .with_src_path(f"/v/{i:03}")
        .with_duration(int(d))
        for i, d in enumerate(rng.integers(50, 200, 200))
    ]
    expected = search(hashes, 0.48, backend="naive")
    got = search(hashes, 0.48, backend="native")
    assert got == expected


def test_pipeline_matches_builder(tmp_path):
    from tests.fixtures import make_fixture_videos
    from vid_dup_finder_lib_tpu.models.builder import VideoHashBuilder
    from vid_dup_finder_lib_tpu.models.pipeline import hash_videos

    import os

    vids = make_fixture_videos(
        os.path.join(os.path.dirname(__file__), "data")
    )[:2]
    res = hash_videos(vids)
    b = VideoHashBuilder()
    for v in vids:
        assert np.array_equal(res[v].hash, b.hash(v).hash)
