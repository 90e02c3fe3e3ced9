"""Extra app-layer coverage: display modes, incremental seeding, timers,
resolution thunk distance."""

import json
import os

import numpy as np
import pytest

from vid_dup_finder_lib_tpu import Search, VideoHash
from vid_dup_finder_lib_tpu.app.app_cfg import (
    AppCfg,
    CacheCfg,
    MatchDbCfg,
    OutputCfg,
    OutputFormat,
    TextOutputCfg,
)
from vid_dup_finder_lib_tpu.app.app_fns import run_app_inner
from vid_dup_finder_lib_tpu.app.match_db import MatchDb


def _cfg(tmp_path, **kw):
    return AppCfg(
        cache_cfg=CacheCfg(
            cache_path=str(tmp_path / "cache.json"), update_cache=False
        ),
        **kw,
    )


def test_display_match_db_matches(tmp_path, capsys):
    db = MatchDb(tmp_path / "mdb")
    db.insert_confirmed_group(["/x/a", "/x/b"])
    db.insert_falsepos_pair("/x/c", "/x/d")
    db.to_disk()

    cfg = _cfg(
        tmp_path,
        matchdb_cfg=MatchDbCfg(db_path=str(tmp_path / "mdb")),
        display_match_db_matches=True,
        output_cfg=OutputCfg(
            text=TextOutputCfg(format=OutputFormat.JSON)
        ),
    )
    run_app_inner(cfg)
    out = json.loads(capsys.readouterr().out)
    assert out == [{"reference": None, "duplicates": ["/x/a", "/x/b"]}]


def test_display_match_db_falsepos(tmp_path, capsys):
    db = MatchDb(tmp_path / "mdb")
    db.insert_falsepos_pair("/x/c", "/x/d")
    db.to_disk()
    cfg = _cfg(
        tmp_path,
        matchdb_cfg=MatchDbCfg(db_path=str(tmp_path / "mdb")),
        display_match_db_falsepos=True,
    )
    run_app_inner(cfg)
    out = capsys.readouterr().out
    assert "/x/c" in out and "/x/d" in out


def test_display_validation_failures(tmp_path, capsys):
    db = MatchDb(tmp_path / "mdb")
    db.insert_confirmed_pair("/x/a", "/x/b")
    db.insert_falsepos_pair("/x/a", "/x/b")
    db.to_disk()
    cfg = _cfg(
        tmp_path,
        matchdb_cfg=MatchDbCfg(db_path=str(tmp_path / "mdb")),
        display_match_db_validation_failures=True,
    )
    run_app_inner(cfg)
    out = capsys.readouterr().out
    assert "/x/a" in out and "/x/b" in out


def test_search_seed_incremental():
    rng = np.random.default_rng(3)
    a = VideoHash.random_hash(rng).with_src_path("/a").with_duration(10)
    b = a.hash_with_spatial_distance(50, rng).with_src_path("/b")
    c = VideoHash.random_hash(rng).with_src_path("/c").with_duration(10)
    s = Search([a])
    assert s.search_self(0.2) == []
    s2 = Search([a])
    s2.seed([b, c])
    groups = s2.search_self(0.2)
    assert groups == [["/b", "/a"]]


def test_phase_timer_prints(monkeypatch, capsys):
    from vid_dup_finder_lib_tpu.utils.timers import phase_timer

    monkeypatch.setenv("VDF_PRINT_TIMINGS", "1")
    with phase_timer("unit_test_phase"):
        pass
    assert "unit_test_phase time:" in capsys.readouterr().out
    monkeypatch.setenv("VDF_PRINT_TIMINGS", "0")
    with phase_timer("quiet_phase"):
        pass
    assert "quiet_phase" not in capsys.readouterr().out


def test_resolution_thunk_max_distance():
    from vid_dup_finder_lib_tpu.app.resolution_thunk import ResolutionThunk
    from vid_dup_finder_lib_tpu.match_group import MatchGroup

    rng = np.random.default_rng(4)
    h1 = VideoHash.random_hash(rng).with_src_path("/a")
    h2 = h1.hash_with_spatial_distance(100, rng).with_src_path("/b")

    class FakeCache:
        def fetch(self, p):
            return {"/a": h1, "/b": h2}[p]

    t = ResolutionThunk.from_matchgroup(
        MatchGroup.new(["/a", "/b"]), cache=FakeCache()
    )
    assert t.max_distance() == pytest.approx(0.1)


def test_update_cache_only_skips_search(tmp_path):
    from tests.fixtures import make_fixture_videos

    vids_dir = os.path.join(os.path.dirname(__file__), "data")
    make_fixture_videos(vids_dir)
    from vid_dup_finder_lib_tpu.app.app_cfg import DirCfg

    cfg = AppCfg(
        cache_cfg=CacheCfg(
            cache_path=str(tmp_path / "cache.json"),
            update_cache=True,
            update_cache_only=True,
        ),
        dir_cfg=DirCfg(cand_dirs=(vids_dir,)),
    )
    run_app_inner(cfg)
    # the cache was populated even though no search ran
    data = json.load(open(tmp_path / "cache.json"))
    assert len(data) == 6
