"""Ingest-layer tests: byte-exact ffmpeg argument parity, frame policy,
probe behavior, device resize parity."""

import numpy as np
import pytest

from vid_dup_finder_lib_tpu.crop import Crop
from vid_dup_finder_lib_tpu.ingest.ffmpeg_reader import FfmpegFrameReader
from vid_dup_finder_lib_tpu.models.builder import (
    CreationOptions,
    build_frame_reader,
)


def test_ffmpeg_args_byte_exact():
    """Argument layout mirrors ffmpeg_ops.rs:199-331 exactly."""
    r = FfmpegFrameReader(
        "/v/x.mp4", fps=(104857, 16384), skip_forward=15, grayscale=True
    )
    assert r._args() == [
        "ffmpeg", "-hide_banner", "-loglevel", "warning", "-nostats",
        "-threads", "1",
        "-ss", "15",
        "-i", "/v/x.mp4",
        "-vf", "fps=104857/16384",
        "-pix_fmt", "gray",
        "-c:v", "rawvideo", "-f", "image2pipe", "-",
    ]
    # rgb + multithreaded + no seek/fps
    r2 = FfmpegFrameReader("/v/y.mkv", grayscale=False, multithreaded=True)
    assert r2._args() == [
        "ffmpeg", "-hide_banner", "-loglevel", "warning", "-nostats",
        "-i", "/v/y.mkv",
        "-pix_fmt", "rgb24",
        "-c:v", "rawvideo", "-f", "image2pipe", "-",
    ]
    r3 = FfmpegFrameReader("/v/z.mp4", num_frames=16)
    assert "-vframes" in r3._args() and "16" in r3._args()


def test_frame_policy_classes(monkeypatch):
    """The 4 video-length classes of build_frame_reader
    (video_hash_builder.rs:100-156)."""
    import vid_dup_finder_lib_tpu.models.builder as b

    durations = {}

    def fake_get_duration(p):
        return durations[p]

    monkeypatch.setattr(b, "get_duration", fake_get_duration)
    opts = CreationOptions(skip_forward_amount=15.0, duration=10.0)

    durations["a"] = 1.5  # < 2 s: fps=64, no seek
    cfg = build_frame_reader("a", opts)
    assert cfg.fps == (int(64.0 * 16384), 16384)
    assert cfg.start_offset is None

    durations["b"] = 7.0  # < hash duration: fps = 64/(len-2)
    cfg = build_frame_reader("b", opts)
    assert cfg.fps == (int(64.0 / 5.0 * 16384), 16384)
    assert cfg.start_offset is None

    durations["c"] = 20.0  # < skip+duration: seek = len - dur - 2
    cfg = build_frame_reader("c", opts)
    assert cfg.fps == (int(6.4 * 16384), 16384)
    assert cfg.start_offset == pytest.approx(8.0)

    durations["d"] = 1000.0  # long: seek = skip
    cfg = build_frame_reader("d", opts)
    assert cfg.fps == (int(6.4 * 16384), 16384)
    assert cfg.start_offset == pytest.approx(15.0)


def test_probe_not_video(tmp_path):
    from vid_dup_finder_lib_tpu.errors import NotVideo
    from vid_dup_finder_lib_tpu.ingest.probe import VideoInfo, is_video_file

    junk = tmp_path / "x.mp4"
    junk.write_text("not a video")
    with pytest.raises(NotVideo):
        VideoInfo.new(junk)
    assert not is_video_file(junk)
    assert not is_video_file(tmp_path / "missing.mp4")


def test_device_resize_matches_golden():
    from vid_dup_finder_lib_tpu.ops.golden import crop_resize_golden
    from vid_dup_finder_lib_tpu.ops.resize_device import (
        resize_frames_device,
    )

    rng = np.random.default_rng(0)
    frames = rng.integers(0, 256, (3, 16, 120, 160), dtype=np.uint8)
    crop = Crop.from_edge_offsets((160, 120), 10, 6, 4, 8)
    got = resize_frames_device(frames, crop)
    assert got.shape == (3, 16, 16, 16)
    for b in range(3):
        for t in range(16):
            exp = crop_resize_golden(frames[b, t], crop)
            diff = np.abs(
                got[b, t].astype(int) - exp.astype(int)
            ).max()
            assert diff <= 1  # f32 weights vs f64 golden: <=1 gray level


def test_opencv_reader_frame_counts():
    """Full-rate read returns every frame; fps resampling yields the
    expected count (the reference doc-tests assert frame counts,
    vid_frame_iter/src/lib.rs:45)."""
    import os

    from tests.fixtures import FPS, SECONDS, make_fixture_videos
    from vid_dup_finder_lib_tpu.ingest.opencv_reader import OpenCvFrameReader

    vids = make_fixture_videos(
        os.path.join(os.path.dirname(__file__), "data")
    )
    total = int(FPS * SECONDS)  # 288

    frames = list(OpenCvFrameReader(vids[0]).frames())
    assert len(frames) == total
    assert frames[0].ndim == 2  # grayscale

    # 6.4 fps over 12 s -> ~76 output slots before source exhausts
    r = OpenCvFrameReader(vids[0], fps=(int(6.4 * 16384), 16384))
    resampled = list(r.frames())
    assert 74 <= len(resampled) <= 78

    # num_frames cap
    r16 = OpenCvFrameReader(vids[0], fps=(64 * 16384, 16384), num_frames=16)
    assert len(list(r16.frames())) == 16

    # rgb mode
    rgb = next(iter(OpenCvFrameReader(vids[0], grayscale=False).frames()))
    assert rgb.ndim == 3 and rgb.shape[2] == 3
