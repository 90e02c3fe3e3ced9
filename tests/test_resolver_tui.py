"""Terminal resolver tests: scripted end-to-end resolution of fixture
groups (the reference's GUI resolution flow, gui_slint/mod.rs:75-186,
driven through the TTY carousel)."""

import io
import os
import shutil

import pytest

from vid_dup_finder_lib_tpu.match_group import MatchGroup


def _mkfiles(tmp_path, names, content=b"x"):
    tmp_path.mkdir(parents=True, exist_ok=True)
    paths = []
    for i, n in enumerate(names):
        p = tmp_path / n
        p.write_bytes(content + bytes([i]))  # distinct contents
        paths.append(str(p))
    return paths


def test_tui_resolves_group_end_to_end(tmp_path):
    from vid_dup_finder_lib_tpu.app.resolver_tui import run_resolver

    a = _mkfiles(tmp_path / "a", ["v0.mp4", "v1.mp4", "v2.mp4"])
    b = _mkfiles(tmp_path / "b", ["w0.mp4", "w1.mp4"])
    os.makedirs(tmp_path / "trash")
    groups = [MatchGroup.new(a), MatchGroup.new(b)]

    # keep entry 1 of group 1; skip group 2
    out = io.StringIO()
    tui = run_resolver(
        groups,
        trash_dir=str(tmp_path / "trash"),
        inp=io.StringIO("1\nn\n"),
        out=out,
        thumbs=False,
    )
    assert os.path.exists(a[1])
    assert not os.path.exists(a[0]) and not os.path.exists(a[2])
    assert len(os.listdir(tmp_path / "trash")) == 2
    assert all(os.path.exists(p) for p in b)  # skipped untouched
    assert "group 1/2" in out.getvalue() and "group 2/2" in out.getvalue()
    assert len(tui.thunks) == 2


def test_tui_untrash_and_as_rename(tmp_path):
    from vid_dup_finder_lib_tpu.app.resolver_tui import run_resolver

    a = _mkfiles(tmp_path / "a", ["keep.mp4", "name_donor.mp4"])
    groups = [MatchGroup.new(a)]
    out = io.StringIO()
    # '0 as 1': keep entry 0 under entry 1's (now trashed) filename;
    # then 'u1' untrashes entry 1 back (the TUI stays on the group)
    run_resolver(
        groups,
        trash_dir=str(tmp_path / "trash"),
        inp=io.StringIO("0 as 1\nu1\nq\n"),
        out=out,
        thumbs=False,
    )
    # keeper was renamed to the donor's name (collision-suffixed if the
    # untrash came back first — here untrash happens after the rename)
    kept = [f for f in os.listdir(tmp_path / "a")]
    assert any(f.startswith("name_donor") for f in kept)
    assert "untrashed" in out.getvalue()


def test_tui_bad_expression_reports_error(tmp_path):
    from vid_dup_finder_lib_tpu.app.resolver_tui import run_resolver

    a = _mkfiles(tmp_path / "a", ["v0.mp4", "v1.mp4"])
    out = io.StringIO()
    run_resolver(
        [MatchGroup.new(a)],
        trash_dir=str(tmp_path / "trash"),
        inp=io.StringIO("banana\n9\nq\n"),
        out=out,
        thumbs=False,
    )
    text = out.getvalue()
    assert "error:" in text  # both bad inputs handled, no crash
    assert all(os.path.exists(p) for p in a)


@pytest.mark.skipif(not hasattr(os, "openpty"), reason="no pty")
def test_tui_over_real_pty(tmp_path):
    """Smoke the interactive path through an actual pty."""
    import pty
    import subprocess
    import sys

    a = _mkfiles(tmp_path / "a", ["v0.mp4", "v1.mp4"])
    script = (
        "import sys; sys.path.insert(0, '/root/repo');"
        "from vid_dup_finder_lib_tpu.app.resolver_tui import run_resolver;"
        "from vid_dup_finder_lib_tpu.match_group import MatchGroup;"
        f"run_resolver([MatchGroup.new({a!r})], trash_dir={str(tmp_path / 'trash')!r}, thumbs=False)"
    )
    master, slave = pty.openpty()
    proc = subprocess.Popen(
        [sys.executable, "-c", script],
        stdin=slave,
        stdout=slave,
        stderr=subprocess.DEVNULL,
        close_fds=True,
    )
    os.close(slave)
    os.write(master, b"0\nq\n")
    try:
        rc = proc.wait(timeout=60)
    finally:
        os.close(master)
        if proc.poll() is None:
            proc.kill()
    assert rc == 0
    assert os.path.exists(a[0]) and not os.path.exists(a[1])


def test_ansi_thumb_renders_fixture_video():
    from tests.fixtures import make_fixture_videos
    from vid_dup_finder_lib_tpu.app.resolver_tui import _ansi_thumb

    vids_dir = os.path.join(os.path.dirname(__file__), "data")
    vids = make_fixture_videos(vids_dir)
    lines = _ansi_thumb(vids[0])
    assert len(lines) == 12
    assert "\x1b[38;5;" in lines[0] and lines[0].endswith("\x1b[0m")


def test_thumb_lru_cache_eviction_and_mtime(tmp_path):
    from vid_dup_finder_lib_tpu.app.resolver_tui import ThumbLruCache

    c = ThumbLruCache(capacity=2)
    files = _mkfiles(tmp_path, ["a.mp4", "b.mp4", "c.mp4"])
    c.put(files[0], ["A"])
    c.put(files[1], ["B"])
    assert c.get(files[0]) == ["A"]  # promoted
    c.put(files[2], ["C"])  # evicts b (least recent)
    assert c.get(files[1]) is None
    assert c.get(files[0]) == ["A"] and c.get(files[2]) == ["C"]

    # mtime invalidation: touching the file misses the stale entry
    os.utime(files[0], (1, 1))
    assert c.get(files[0]) is None


def test_player_thread_kills_previous(tmp_path):
    import subprocess
    import sys
    import time

    from vid_dup_finder_lib_tpu.app.resolver_tui import PlayerThread

    player = tmp_path / "fakeplayer"
    player.write_text("#!/usr/bin/env python3\nimport time\ntime.sleep(60)\n")
    player.chmod(0o755)

    pt = PlayerThread(player_cmd=str(player))
    msg1 = pt.open("/v/a.mp4")
    assert "opened" in msg1
    first = pt._proc
    assert first.poll() is None
    pt.open("/v/b.mp4")  # must kill the first (vlc_thread.rs:17-27)
    deadline = time.monotonic() + 10
    while first.poll() is None and time.monotonic() < deadline:
        time.sleep(0.05)
    assert first.poll() is not None
    assert pt._proc.poll() is None
    pt._proc.kill()
    pt._proc.wait()


def test_player_thread_missing_binary():
    from vid_dup_finder_lib_tpu.app.resolver_tui import PlayerThread

    msg = PlayerThread(player_cmd="/nonexistent/player-xyz").open("/v/a.mp4")
    assert "error" in msg and "not found" in msg


def test_tui_open_command_and_prerender(tmp_path):
    """'o N' launches the player on the entry; showing group 1 with
    thumbs on prerenders group 2's thumbnails into the LRU."""
    import io
    import time

    from tests.fixtures import make_fixture_videos
    from vid_dup_finder_lib_tpu.app.resolver_tui import (
        PlayerThread,
        ResolverTui,
        ThumbLruCache,
    )
    from vid_dup_finder_lib_tpu.app.resolution_thunk import ResolutionThunk

    vids_dir = os.path.join(os.path.dirname(__file__), "data")
    vids = make_fixture_videos(vids_dir)

    player = tmp_path / "fakeplayer"
    player.write_text(
        "#!/usr/bin/env python3\n"
        "import sys, pathlib\n"
        f"pathlib.Path({str(tmp_path / 'opened.txt')!r}).write_text(sys.argv[1])\n"
    )
    player.chmod(0o755)

    cache = ThumbLruCache()
    tui = ResolverTui(
        thunks=[
            ResolutionThunk(entries=vids[:2]),
            ResolutionThunk(entries=vids[2:4]),
        ],
        inp=io.StringIO("o1\nq\n"),
        out=io.StringIO(),
        thumbs=True,
        thumb_cache=cache,
        player=PlayerThread(player_cmd=str(player)),
    )
    tui.run()

    deadline = time.monotonic() + 15
    while time.monotonic() < deadline:
        if (tmp_path / "opened.txt").exists() and all(
            cache.get(p) is not None for p in vids[2:4]
        ):
            break
        time.sleep(0.1)
    assert (tmp_path / "opened.txt").read_text() == vids[1]
    # prerenderer populated the NEXT group's thumbs in the background
    assert all(cache.get(p) is not None for p in vids[2:4])


def test_tui_stats_and_jump(tmp_path):
    """'s' toggles the per-entry quality-stats line (recompression +
    canny signals, lru_cache.rs:66-73 / canny_thresholds.rs); 'g N'
    jumps; navigation wraps like the GUI carousel."""
    import io

    from tests.fixtures import make_fixture_videos
    from vid_dup_finder_lib_tpu.app.resolution_thunk import ResolutionThunk
    from vid_dup_finder_lib_tpu.app.resolver_tui import ResolverTui

    vids_dir = os.path.join(os.path.dirname(__file__), "data")
    vids = make_fixture_videos(vids_dir)
    out = io.StringIO()
    tui = ResolverTui(
        thunks=[
            ResolutionThunk(entries=vids[:2]),
            ResolutionThunk(entries=vids[2:4]),
        ],
        inp=io.StringIO("s\ng2\np\np\nq\n"),  # stats on, jump, wrap back
        out=out,
        thumbs=False,
    )
    tui.run()
    text = out.getvalue()
    assert "stats: " in text and "png" in text and "canny" in text
    assert "group 2/2" in text  # g2 jumped
    # p from group 1 wraps to group 2 (Modulo carousel)
    assert text.count("group 2/2") >= 2
