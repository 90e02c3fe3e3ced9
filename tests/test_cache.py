"""Cache-layer tests: atomic saves, mtime validation, error caching,
metadata sidecar invalidation, batched update, resume semantics."""

import json
import os
import time

import numpy as np
import pytest

from vid_dup_finder_lib_tpu import Cropdetect, VdfError
from vid_dup_finder_lib_tpu.cache.base_cache import BaseFsCache
from vid_dup_finder_lib_tpu.cache.filename_pattern import FilenamePattern
from vid_dup_finder_lib_tpu.cache.hash_cache import (
    VdfCacheError,
    VideoHashFilesystemCache,
)
from vid_dup_finder_lib_tpu.cache.processing_cache import (
    ProcessingFsCache,
    UpdateAction,
)
from vid_dup_finder_lib_tpu.models.builder import CreationOptions

from .fixtures import make_fixture_videos

DATA_DIR = os.path.join(os.path.dirname(__file__), "data")


@pytest.fixture(scope="module")
def vids():
    return make_fixture_videos(DATA_DIR)


def test_base_cache_roundtrip(tmp_path):
    p = tmp_path / "c.json"
    c = BaseFsCache(p)
    c.insert("a", {"x": 1})
    c.insert("b", [1, 2])
    c.save()
    c2 = BaseFsCache(p)
    assert c2.get("a") == {"x": 1}
    assert c2.get("b") == [1, 2]
    assert len(c2) == 2
    c2.remove("a")
    assert not c2.contains_key("a")


def test_base_cache_autosave_threshold(tmp_path):
    p = tmp_path / "c.json"
    c = BaseFsCache(p, save_threshold=3)
    c.insert("a", 1)
    c.insert("b", 2)
    # not yet persisted
    assert "b" not in json.load(open(p))
    c.insert("c", 3)  # third mutation triggers autosave
    assert json.load(open(p)) == {"a": 1, "b": 2, "c": 3}


def test_processing_cache_mtime_validation(tmp_path):
    src = tmp_path / "data.txt"
    src.write_text("v1")
    calls = []

    def load(path):
        calls.append(path)
        return open(path).read()

    c = ProcessingFsCache(tmp_path / "c.json", load)
    assert c.fetch_update(str(src)) == "v1"
    assert c.fetch_update(str(src)) == "v1"
    assert len(calls) == 1  # second fetch hit the cache

    # modify beyond the 2 s tolerance
    src.write_text("v2")
    old = time.time() - 100
    os.utime(src, (old, old))
    assert c.fetch_update(str(src)) == "v2"
    assert len(calls) == 2

    # deleting the source removes the entry
    src.unlink()
    assert c.plan_update(str(src)) is UpdateAction.REMOVE
    with pytest.raises(KeyError):
        c.fetch_update(str(src))


def test_processing_cache_mtime_tolerance(tmp_path):
    src = tmp_path / "d.txt"
    src.write_text("x")
    c = ProcessingFsCache(tmp_path / "c.json", lambda p: "val")
    c.fetch_update(str(src))
    # shift mtime by 2 s (within tolerance): treated as unchanged
    st = os.stat(src)
    os.utime(src, (st.st_atime, st.st_mtime + 2))
    assert c.plan_update(str(src)) is UpdateAction.NO_CHANGE
    os.utime(src, (st.st_atime, st.st_mtime + 3))
    assert c.plan_update(str(src)) is UpdateAction.UPDATE


def test_hash_cache_end_to_end(tmp_path, vids):
    cache = VideoHashFilesystemCache(tmp_path / "hashes.json")
    n = cache.update_using_fs(vids)
    assert n == 6
    assert len(cache.all_cached_paths()) == 6
    h = cache.fetch(vids[0])
    assert h.src_path == vids[0] and h.duration == 12

    # second update: everything fresh, nothing rehashed
    assert cache.update_using_fs(vids) == 0

    # batched result must equal the single-video builder path
    from vid_dup_finder_lib_tpu.models.builder import VideoHashBuilder

    direct = VideoHashBuilder().hash(vids[0])
    assert np.array_equal(direct.hash, h.hash)

    # persistence across reopen
    cache.save()
    cache2 = VideoHashFilesystemCache(tmp_path / "hashes.json")
    assert np.array_equal(cache2.fetch(vids[0]).hash, h.hash)


def test_hash_cache_caches_errors(tmp_path):
    bad = tmp_path / "not_a_video.mp4"
    bad.write_text("junk")
    cache = VideoHashFilesystemCache(tmp_path / "hashes.json")
    assert cache.update_using_fs([str(bad)]) == 1
    assert cache.error_paths() == [str(bad)]
    with pytest.raises(VdfError):
        cache.fetch(str(bad))
    # error entries are NOT retried unless reload_errors
    assert cache.update_using_fs([str(bad)]) == 0
    assert cache.update_using_fs([str(bad)], reload_errors=True) == 1


def test_hash_cache_metadata_invalidation(tmp_path, vids):
    path = tmp_path / "hashes.json"
    VideoHashFilesystemCache(path)  # writes sidecar with default opts
    with pytest.raises(VdfCacheError):
        VideoHashFilesystemCache(
            path,
            creation_options=CreationOptions(cropdetect=Cropdetect.MOTION),
        )


def test_hash_cache_prune_deleted(tmp_path, vids):
    import shutil

    v = tmp_path / "copy.mp4"
    shutil.copy(vids[0], v)
    cache = VideoHashFilesystemCache(tmp_path / "hashes.json")
    cache.update_using_fs([str(v)])
    v.unlink()
    assert cache.prune_deleted() == 1
    assert len(cache) == 0


def test_filename_pattern(tmp_path):
    (tmp_path / "a").mkdir()
    (tmp_path / "a" / "x.mp4").write_text("")
    (tmp_path / "a" / "y.jpg").write_text("")
    (tmp_path / "a" / "sub").mkdir()
    (tmp_path / "a" / "sub" / "z.mkv").write_text("")
    (tmp_path / "b").mkdir()
    (tmp_path / "b" / "w.mp4").write_text("")

    pat = FilenamePattern.new(
        includes=[str(tmp_path)],
        excludes=[str(tmp_path / "b")],
        excl_exts=["jpg"],
    )
    found = sorted(pat.iterate_from_fs())
    assert found == sorted(
        [str(tmp_path / "a" / "x.mp4"), str(tmp_path / "a" / "sub" / "z.mkv")]
    )
    assert pat.includes_path(str(tmp_path / "a" / "x.mp4"))
    assert not pat.includes_path(str(tmp_path / "a" / "y.JPG"))
    assert not pat.includes_path(str(tmp_path / "b" / "w.mp4"))
