"""Exercise the ffmpeg/ffprobe subprocess paths with fake binaries.

This machine has no ffmpeg, so the pipe reader and the ffprobe probe
(`ingest/ffmpeg_reader.py`, `ingest/probe.py`) would otherwise never run.
A fake `ffprobe` prints reference-shaped JSON (including a rotation
side_data), and a fake `ffmpeg` writes deterministic rawvideo frames to
stdout, validating the full parse/read loop byte-for-byte.
"""

import json
import os
import stat

import numpy as np
import pytest

W, H, NFRAMES = 32, 24, 5


@pytest.fixture()
def fake_ffmpeg(tmp_path, monkeypatch):
    bindir = tmp_path / "bin"
    bindir.mkdir()

    probe_json = {
        "format": {"duration": "12.5", "size": "4096"},
        "streams": [
            {"codec_type": "video", "width": W, "height": H},
        ],
    }
    (bindir / "ffprobe").write_text(
        "#!/bin/sh\n"
        f"cat <<'EOF'\n{json.dumps(probe_json)}\nEOF\n"
    )
    # frames: frame k filled with byte value 10*k
    (bindir / "ffmpeg").write_text(
        "#!/bin/sh\n"
        "python3 - <<'EOF'\n"
        "import sys\n"
        f"for k in range({NFRAMES}):\n"
        f"    sys.stdout.buffer.write(bytes([10 * k]) * ({W} * {H}))\n"
        "EOF\n"
    )
    for name in ("ffprobe", "ffmpeg"):
        p = bindir / name
        p.chmod(p.stat().st_mode | stat.S_IEXEC)
    monkeypatch.setenv(
        "PATH", f"{bindir}{os.pathsep}{os.environ['PATH']}"
    )
    return bindir


def test_ffprobe_parse(fake_ffmpeg):
    from vid_dup_finder_lib_tpu.ingest.probe import VideoInfo

    info = VideoInfo._from_ffprobe("/v/x.mp4")
    assert info.duration == 12.5
    assert info.file_size == 4096
    assert info.resolution == (W, H)


def test_ffprobe_rotation_swap(fake_ffmpeg, tmp_path):
    probe_json = {
        "format": {"duration": "5", "size": "1"},
        "streams": [
            {
                "codec_type": "video",
                "width": W,
                "height": H,
                "side_data_list": [{"rotation": -90}],
            }
        ],
    }
    (tmp_path / "bin" / "ffprobe").write_text(
        "#!/bin/sh\n" f"cat <<'EOF'\n{json.dumps(probe_json)}\nEOF\n"
    )
    from vid_dup_finder_lib_tpu.ingest.probe import VideoInfo

    info = VideoInfo._from_ffprobe("/v/rot.mp4")
    assert info.resolution == (H, W)  # 90/270 swaps width/height


def test_ffmpeg_pipe_reader(fake_ffmpeg):
    from vid_dup_finder_lib_tpu.ingest.ffmpeg_reader import (
        FfmpegFrameReader,
        ffmpeg_available,
    )

    assert ffmpeg_available()
    r = FfmpegFrameReader("/v/x.mp4", fps=(104857, 16384), skip_forward=3)
    frames = list(r.frames())
    assert len(frames) == NFRAMES
    for k, f in enumerate(frames):
        assert f.shape == (H, W)
        assert (f == 10 * k).all()


def test_backend_facade_prefers_ffmpeg(fake_ffmpeg):
    from vid_dup_finder_lib_tpu.ingest.backend import (
        FrameReadCfg,
        available_backends,
    )

    assert available_backends()[0] == "ffmpeg"
    cfg = FrameReadCfg.from_path("/v/x.mp4")
    cfg.set_fps((104857, 16384))
    cfg.set_start_offset(7.9)
    frames = list(cfg.spawn_gray())
    assert len(frames) == NFRAMES  # facade routed through the pipe reader


# -- run-to-completion harness (ffmpeg_ops.rs:491-596) -------------------------


def _write_exe(path, text):
    import stat

    path.write_text(text)
    path.chmod(path.stat().st_mode | stat.S_IEXEC)


def test_harness_success_drains_both_pipes(tmp_path):
    from vid_dup_finder_lib_tpu.ingest.ffmpeg_harness import (
        run_ffmpeg_command,
    )

    exe = tmp_path / "noisy"
    # interleaves big stderr writes with stdout: deadlocks without a
    # concurrent stderr drain once the 64 KB pipe buffer fills
    _write_exe(
        exe,
        "#!/usr/bin/env python3\n"
        "import sys\n"
        "for k in range(100):\n"
        "    sys.stderr.write('e' * 4096); sys.stderr.flush()\n"
        "    sys.stdout.write('o' * 1024); sys.stdout.flush()\n",
    )
    out = run_ffmpeg_command([str(exe)])
    assert out == b"o" * 1024 * 100


def test_harness_nonzero_exit_truncates_stderr_to_500(tmp_path):
    import pytest

    from vid_dup_finder_lib_tpu.ingest.ffmpeg_harness import (
        FfmpegInternal,
        run_ffmpeg_command,
    )

    exe = tmp_path / "failing"
    _write_exe(
        exe,
        "#!/usr/bin/env python3\n"
        "import sys\n"
        "sys.stderr.write('x' * 5000)\n"
        "sys.exit(3)\n",
    )
    with pytest.raises(FfmpegInternal) as ei:
        run_ffmpeg_command([str(exe)])
    assert ei.value.msg == "x" * 500  # truncated, raw payload kept


def test_harness_watchdog_timeout(tmp_path):
    import time

    import pytest

    from vid_dup_finder_lib_tpu.ingest.ffmpeg_harness import (
        FfmpegIo,
        run_ffmpeg_command,
    )

    exe = tmp_path / "hang"
    _write_exe(exe, "#!/usr/bin/env python3\nimport time\ntime.sleep(60)\n")
    t0 = time.monotonic()
    with pytest.raises(FfmpegIo, match="TimedOut"):
        run_ffmpeg_command([str(exe)], timeout_secs=0.5)
    assert time.monotonic() - t0 < 10  # killed, not waited out


def test_harness_not_found():
    import pytest

    from vid_dup_finder_lib_tpu.ingest.ffmpeg_harness import (
        FfmpegNotFound,
        run_ffmpeg_command,
    )

    with pytest.raises(FfmpegNotFound):
        run_ffmpeg_command(["/nonexistent/ffmpeg-binary-xyz"])


def test_harness_errors_roundtrip_through_cache_json():
    from vid_dup_finder_lib_tpu.errors import VdfError
    from vid_dup_finder_lib_tpu.ingest.ffmpeg_harness import (
        FfmpegInternal,
        FfmpegIo,
        FfmpegNotFound,
        InvalidResolution,
        Utf8Conversion,
    )

    for err in (
        FfmpegNotFound(),
        FfmpegIo("TimedOut"),
        FfmpegInternal("boom " * 10),
        Utf8Conversion(),
        InvalidResolution(),
    ):
        back = VdfError.from_json(err.to_json())
        assert type(back) is type(err)
        assert getattr(back, "msg", "") == getattr(err, "msg", "")


def test_streaming_reader_watchdog_kills_hung_child(tmp_path, fake_ffmpeg):
    """A child that hangs mid-stream is killed at the deadline and the
    reader raises a timeout error instead of blocking forever."""
    import time

    import pytest

    from vid_dup_finder_lib_tpu.errors import VidProc
    from vid_dup_finder_lib_tpu.ingest.ffmpeg_reader import FfmpegFrameReader

    _write_exe(
        fake_ffmpeg / "ffmpeg",
        "#!/usr/bin/env python3\n"
        "import sys, time\n"
        f"sys.stdout.buffer.write(bytes([1]) * ({W} * {H}))\n"
        "sys.stdout.flush()\n"
        "time.sleep(60)\n",
    )
    r = FfmpegFrameReader("/v/x.mp4", timeout_secs=1.0)
    t0 = time.monotonic()
    with pytest.raises(VidProc, match="timed out"):
        list(r.frames())
    assert time.monotonic() - t0 < 15
