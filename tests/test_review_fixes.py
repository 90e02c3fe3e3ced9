"""Regression tests for review findings (round 2): error-path and
edge-case behavior of the thunk engine, fps policy, CLI exit codes,
digest tagging, and the parallel walker."""

import os
import threading
import time

import pytest

from vid_dup_finder_lib_tpu.match_group import MatchGroup


def _mkfiles(tmp_path, names):
    tmp_path.mkdir(parents=True, exist_ok=True)
    out = []
    for i, n in enumerate(names):
        p = tmp_path / n
        p.write_bytes(b"x" + bytes([i]))
        out.append(str(p))
    return out


def test_out_of_range_as_at_index_is_valueerror(tmp_path):
    """'0 as 9' in a 2-entry group must raise the ValueError the front
    ends catch (not IndexError) and must not trash anything first."""
    from vid_dup_finder_lib_tpu.app.resolution_thunk import ResolutionThunk

    a = _mkfiles(tmp_path / "a", ["x.mp4", "y.mp4"])
    t = ResolutionThunk.from_matchgroup(
        MatchGroup.new(a), trash_dir=str(tmp_path / "trash")
    )
    with pytest.raises(ValueError):
        t.resolve("0 as 9")
    with pytest.raises(ValueError):
        t.resolve("0 at 9")
    assert all(os.path.exists(p) for p in a)  # nothing was trashed


def test_two_second_video_saturates_fps(monkeypatch, tmp_path):
    """duration == 2.0 s: the reference's f64 division yields inf and the
    `as u64` cast saturates (video_hash_builder.rs:146); the port must
    mirror that instead of raising ZeroDivisionError."""
    from vid_dup_finder_lib_tpu.models import builder

    vid = tmp_path / "v.mp4"
    vid.write_bytes(b"notavideo")
    monkeypatch.setattr(builder, "get_duration", lambda p: 2.0)
    cfg = builder.build_frame_reader(
        str(vid), builder.DEFAULT_CREATION_OPTIONS
    )
    num, den = cfg.fps
    assert num == 2**64 - 1
    assert den == 16384


def test_run_app_string_systemexit_returns_2(capsys):
    """expand_args_file raises SystemExit with a MESSAGE; run_app must
    report it and return exit code 2, not crash in int()."""
    from vid_dup_finder_lib_tpu.app.app_fns import run_app

    rc = run_app(["--args-file"])
    assert rc == 2
    assert "args-file" in capsys.readouterr().err

    rc = run_app(["--args-file", "/nonexistent/args.txt"])
    assert rc == 2


def test_digest_tagging_and_legacy_compat(tmp_path):
    from vid_dup_finder_lib_tpu.cache.file_content_cache import (
        canonical_digest,
        hash_file_contents,
    )

    p = tmp_path / "f.bin"
    p.write_bytes(b"hello")
    d = hash_file_contents(str(p))
    alg, _, hx = d.partition(":")
    assert alg in ("blake3", "blake2b") and len(hx) == 64
    # legacy bare-hex entries normalize to the current algorithm
    assert canonical_digest(hx) == d
    assert canonical_digest(d) == d
    # a digest tagged with a DIFFERENT algorithm can never match
    assert canonical_digest("otheralgo:" + hx) != d


def test_fix_moved_files_with_legacy_bare_digest(tmp_path):
    """A match db whose stored content digest predates the algo tag must
    still re-link moved files."""
    from vid_dup_finder_lib_tpu.app.match_db import MatchDb
    from vid_dup_finder_lib_tpu.cache.file_content_cache import (
        hash_file_contents,
    )

    old = tmp_path / "vids" / "a.mp4"
    old.parent.mkdir()
    old.write_bytes(b"samecontent")
    b = tmp_path / "vids" / "b.mp4"
    b.write_bytes(b"other")

    db = MatchDb(str(tmp_path / "db"))
    db.insert_confirmed_pair(str(old), str(b))
    # simulate a legacy cache entry: strip the algorithm tag
    db.content_hashes[str(old)] = hash_file_contents(str(old)).rpartition(
        ":"
    )[2]

    moved = tmp_path / "vids" / "moved.mp4"
    os.rename(old, moved)
    fixed = db.fix_moved_files([str(moved), str(b)])
    assert fixed == 1
    assert db.confirmed.contains(str(moved))


def test_walker_threads_exit_when_consumer_abandons(tmp_path):
    """Breaking out of iterate_from_fs early (bounded queue full) must
    not leave walker threads blocked forever."""
    from vid_dup_finder_lib_tpu.cache.filename_pattern import (
        FilenamePattern,
    )

    d = tmp_path / "many"
    d.mkdir()
    for i in range(5000):  # > the queue bound of 4096
        (d / f"f{i:05}.mp4").write_bytes(b"")
    pat = FilenamePattern([str(d)])

    before = threading.active_count()
    it = pat.iterate_from_fs()
    next(it)
    it.close()  # abandon with the queue full

    deadline = time.time() + 10
    while time.time() < deadline:
        if threading.active_count() <= before:
            break
        time.sleep(0.1)
    assert threading.active_count() <= before, "walker threads leaked"


def test_ring_scan_pads_never_count(tmp_path):
    """n not a multiple of the mesh size + a low-popcount hash: pad
    columns must not inflate counts or surface sentinel best-ids."""
    import numpy as np

    from vid_dup_finder_lib_tpu.parallel.mesh import make_mesh
    from vid_dup_finder_lib_tpu.parallel.sharded_search import (
        ring_candidate_scan,
    )

    rng = np.random.default_rng(7)
    n = 100  # 8-device mesh pads to 104
    packed = rng.integers(0, 2**32, (n, 32), dtype=np.uint64).astype(
        np.uint32
    )
    packed[:, -1] &= np.uint32(0xFF)
    # a near-dark video: popcount ~250 <= tolerance 300 vs a zero pad row
    packed[50] = 0
    for w in rng.choice(31, 8, replace=False):
        packed[50, w] = np.uint32(0xFF)
    durations = np.sort(rng.integers(50, 60, n))  # wide mutual windows
    mesh = make_mesh(8)
    counts, best_dist, best_idx = ring_candidate_scan(
        mesh, packed, durations, 300
    )
    assert best_idx.max() < n, "pad sentinel id leaked into best_idx"
    # brute-force expected counts
    thresh = (durations * 1.1).astype(np.int64)
    exp = np.zeros(n, np.int64)
    for i in range(n):
        for j in range(n):
            if j > i and durations[j] <= thresh[i]:
                d = int(
                    np.bitwise_count(packed[i] ^ packed[j]).sum()
                )
                if d <= 300:
                    exp[i] += 1
    assert np.array_equal(counts, exp)


def test_walker_dedups_overlapping_roots(tmp_path):
    from vid_dup_finder_lib_tpu.cache.filename_pattern import (
        FilenamePattern,
    )

    d = tmp_path / "vids"
    sub = d / "sub"
    sub.mkdir(parents=True)
    (d / "a.mp4").write_bytes(b"")
    (sub / "b.mp4").write_bytes(b"")
    pat = FilenamePattern(
        [str(d), str(sub), str(sub / "b.mp4"), str(d)]
    )
    out = sorted(pat.iterate_from_fs())
    assert out == sorted([str(d / "a.mp4"), str(sub / "b.mp4")])


def test_metadata_schema_drift_is_cache_error(tmp_path):
    import json

    from vid_dup_finder_lib_tpu.cache.hash_cache import (
        VdfCacheError,
        VideoHashFilesystemCache,
    )

    cache_path = tmp_path / "hashes.json"
    meta = tmp_path / "hashes.metadata.json"
    meta.write_text(json.dumps({"cache_version": 99, "bogus_field": 1}))
    with pytest.raises(VdfCacheError):
        VideoHashFilesystemCache(str(cache_path))


def test_sidecar_records_forced_backend(tmp_path):
    import json

    from vid_dup_finder_lib_tpu.cache.hash_cache import (
        VideoHashFilesystemCache,
    )
    from vid_dup_finder_lib_tpu.ingest import backend as be

    be.force_backend("opencv")
    try:
        VideoHashFilesystemCache(str(tmp_path / "h.json"))
        meta = json.loads((tmp_path / "h.metadata.json").read_text())
        assert meta["decode_backend"] == "opencv"
    finally:
        be.force_backend(None)


def test_expression_language_parity():
    """Both 'as X at Y' orders parse; untrash combined with as/at is
    unparseable (the reference's six regexes, resolution_thunk.rs:256-292)."""
    from vid_dup_finder_lib_tpu.app.resolution_thunk import (
        _parse_expression,
    )

    assert _parse_expression("1 as 2 at 3") == (False, "1", "2", "3")
    assert _parse_expression("1 at 3 as 2") == (False, "1", "2", "3")
    assert _parse_expression("1as2") == (False, "1", "2", None)  # \s*
    assert _parse_expression("u1") == (True, "1", None, None)
    assert _parse_expression("u1 as 2") is None
    assert _parse_expression("u1 at 2") is None


def test_untrash_never_clobbers(tmp_path):
    """'0 as 1' then 'u1': the untrashed file must not overwrite the
    keeper now occupying its old path."""
    from vid_dup_finder_lib_tpu.app.resolution_thunk import ResolutionThunk

    a = _mkfiles(tmp_path / "a", ["keep.mp4", "donor.mp4"])
    t = ResolutionThunk.from_matchgroup(
        MatchGroup.new(a), trash_dir=str(tmp_path / "trash")
    )
    # entries sort alphabetically: [donor.mp4, keep.mp4].  '0 as 1'
    # trashes keep.mp4 and renames donor onto keep.mp4's path.
    t.resolve("0 as 1")
    kept = [e for e in t.entries if os.path.exists(e)][0]
    kept_bytes = open(kept, "rb").read()
    t.resolve("u1")  # keep.mp4 comes back — beside, not over, the keeper
    assert open(kept, "rb").read() == kept_bytes
    assert os.path.exists(str(tmp_path / "a" / "keep (1).mp4"))


def test_matchdb_save_is_atomic_with_bak_copy(tmp_path):
    import json

    from vid_dup_finder_lib_tpu.app.match_db import MatchDb

    f1 = _mkfiles(tmp_path / "v", ["a.mp4", "b.mp4"])
    db = MatchDb(str(tmp_path / "db"))
    db.insert_confirmed_pair(*f1)
    db.to_disk()
    first = open(db._confirmed_path()).read()
    db.insert_falsepos_pair(*f1)
    db.to_disk()
    # the .bak is a COPY of the previous good file (the old scheme moved
    # it away before writing, leaving a crash window with no good copy)
    baks = [
        p
        for p in os.listdir(tmp_path / "db")
        if p.startswith("confirmed.json.") and p.endswith(".bak")
    ]
    assert baks
    assert json.loads(first) == json.loads(
        open(tmp_path / "db" / sorted(baks)[-1]).read()
    )
    json.loads(open(db._confirmed_path()).read())  # current file valid


def test_bad_numeric_flags_exit_2(capsys):
    from vid_dup_finder_lib_tpu.app.app_fns import run_app

    assert run_app(["--files", "/tmp", "--tolerance", "abc"]) == 2
    assert "tolerance" in capsys.readouterr().err
    assert run_app(["--files", "/tmp", "--display-match-db-matches"]) == 2


def test_strip_comments_respects_quotes():
    from vid_dup_finder_lib_tpu.app.arg_parse import strip_comments

    assert strip_comments("--files '/data/my #set'  # real comment") == (
        "--files '/data/my #set'  "
    )
    assert strip_comments('--files "/d/a#b"') == '--files "/d/a#b"'
    assert strip_comments("plain # comment") == "plain "
