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
