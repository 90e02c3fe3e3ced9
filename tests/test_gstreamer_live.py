"""LIVE gstreamer decode tests via the ctypes binding (no PyGObject).

The reference's primary decode backend is gstreamer
(``vid_frame_iter/src/frame_iter.rs:59-347``); ``gst_ctypes.py`` binds
the same C libraries directly so the backend runs even without ``gi``.
These tests exercise the REAL pipeline end to end: a fixture video is
synthesized with ``videotestsrc ! theoraenc ! oggmux`` (the plugin set
this image ships), then decoded through the production
``uridecodebin ! videorate ! capsfilter ! videoconvert ! appsink``
path — frame counts, fps resampling, accurate seeks, RGB/GRAY8 caps,
teardown, and error containment, mirroring the reference's doc-test
strategy of decoding bundled videos and asserting frame counts
(``vid_frame_iter/src/lib.rs:21-119``).

Skipped wholesale where the gst C libraries are absent.
"""

from __future__ import annotations

import os

import numpy as np
import pytest

from vid_dup_finder_lib_tpu.errors import VidProc
from vid_dup_finder_lib_tpu.ingest import gst_ctypes

pytestmark = pytest.mark.skipif(
    not gst_ctypes.available()
    or not all(
        gst_ctypes.has_element(e)
        for e in ("videotestsrc", "theoraenc", "oggmux", "oggdemux")
    ),
    reason="gst C libraries or base plugins unavailable",
)

W, H, FPS, NFRAMES = 160, 120, 24, 48  # 2 s of SMPTE bars


@pytest.fixture(scope="module")
def fixture_video(tmp_path_factory) -> str:
    out = tmp_path_factory.mktemp("gstlive") / "bars.ogv"
    gst_ctypes.run_pipeline_to_eos(
        f"videotestsrc num-buffers={NFRAMES} pattern=smpte ! "
        f"video/x-raw,width={W},height={H},framerate={FPS}/1 ! "
        f"theoraenc ! oggmux ! filesink location={out}"
    )
    assert out.stat().st_size > 0
    return str(out)


def _gray_frames(path, **kw):
    return list(gst_ctypes.GstCtypesFrameReader(path, **kw).frames())


def test_live_decode_counts_and_shape(fixture_video):
    frames = _gray_frames(fixture_video)
    assert len(frames) == NFRAMES
    for f in frames:
        assert f.shape == (H, W) and f.dtype == np.uint8


def test_live_smpte_band_structure(fixture_video):
    """The decoded pixels are the actual pattern, not garbage: SMPTE's
    seven top bars have strictly decreasing luma left to right."""
    f = _gray_frames(fixture_video)[0].astype(np.float64)
    bands = [f[: H * 2 // 3, i * W // 7 : (i + 1) * W // 7].mean() for i in range(7)]
    assert all(bands[i] > bands[i + 1] + 5 for i in range(6)), bands


def test_live_determinism(fixture_video):
    a = _gray_frames(fixture_video)
    b = _gray_frames(fixture_video)
    assert len(a) == len(b)
    for x, y in zip(a, b):
        assert np.array_equal(x, y)


def test_live_fps_resample(fixture_video):
    # videorate 24 -> 6 fps over 2 s: 12 frames (frame_iter.rs:59-76)
    frames = _gray_frames(fixture_video, fps=(6, 1))
    assert len(frames) == NFRAMES // 4


def test_live_accurate_seek(fixture_video):
    # flush+accurate 1 s seek into a 2 s clip leaves exactly 1 s
    frames = _gray_frames(fixture_video, start_offset=1.0)
    assert len(frames) == NFRAMES // 2


def test_live_rgb(fixture_video):
    reader = gst_ctypes.GstCtypesFrameReader(
        fixture_video, grayscale=False
    )
    first = next(iter(reader.frames()))
    assert first.shape == (H, W, 3) and first.dtype == np.uint8


def test_live_partial_consumption_teardown(fixture_video):
    """Abandoning the iterator mid-stream (the builder's take-16) tears
    the pipeline down without hanging (frame_iter.rs:335-347)."""
    it = gst_ctypes.GstCtypesFrameReader(fixture_video).frames()
    got = [next(it) for _ in range(16)]
    it.close()
    assert len(got) == 16


def test_live_error_on_garbage(tmp_path):
    bad = tmp_path / "junk.ogv"
    bad.write_bytes(b"\x00not a video\xff" * 1024)
    with pytest.raises(VidProc):
        _gray_frames(str(bad))


def test_live_through_facade(fixture_video):
    """`force_backend('gstreamer')` routes FrameReadCfg through the
    ctypes binding when gi is absent (backend facade integration)."""
    from vid_dup_finder_lib_tpu.ingest import backend as be

    assert "gstreamer" in be.available_backends()
    be.force_backend("gstreamer")
    try:
        cfg = be.FrameReadCfg.from_path(fixture_video)
        cfg.set_fps((12, 1))
        frames = list(cfg.spawn_gray())
    finally:
        be.force_backend(None)
    assert len(frames) == NFRAMES // 2
    assert frames[0].shape == (H, W)


def test_live_media_info(fixture_video):
    """gst preroll probe mirrors mediainfo_utils.rs:13-68: duration,
    dimensions, frame rate — no ffprobe/OpenCV involved."""
    duration, (w, h), fps = gst_ctypes.query_media_info(fixture_video)
    assert (w, h) == (W, H)
    assert fps == pytest.approx(FPS)
    assert duration == pytest.approx(NFRAMES / FPS, abs=0.25)


def test_live_probe_gst_tier(fixture_video, monkeypatch):
    """VideoInfo falls through ffprobe (absent) and OpenCV (failing)
    to the gst preroll tier."""
    from vid_dup_finder_lib_tpu.errors import NotVideo
    from vid_dup_finder_lib_tpu.ingest import probe

    def boom(_):
        raise NotVideo()

    monkeypatch.setattr(probe, "ffprobe_available", lambda: False)
    monkeypatch.setattr(probe.VideoInfo, "_from_opencv", staticmethod(boom))
    info = probe.VideoInfo.new(fixture_video)
    assert info.resolution == (W, H)
    assert info.duration == pytest.approx(NFRAMES / FPS, abs=0.25)
    assert info.file_size > 0


def test_live_media_info_rejects_garbage(tmp_path):
    bad = tmp_path / "junk.bin"
    bad.write_bytes(b"\x13\x37" * 4096)
    with pytest.raises(VidProc):
        gst_ctypes.query_media_info(str(bad))


def test_live_builder_e2e_groups(tmp_path):
    """The PRIMARY-backend flow of the reference, end to end on real
    gst decode: VideoHashBuilder (fps policy, letterbox, resize, 3D-DCT
    sign hash) over theora videos, then search.  A rescaled re-encode
    groups with its original; different content does not
    (video_hash_builder.rs:214-223 + the example.rs assertion shape)."""
    import vid_dup_finder_lib_tpu as vdf
    from vid_dup_finder_lib_tpu.ingest import backend as be

    def enc(name, filt=""):
        out = tmp_path / name
        gst_ctypes.run_pipeline_to_eos(
            f"videotestsrc num-buffers=72 pattern=smpte ! "
            f"video/x-raw,width={W},height={H},framerate={FPS}/1 ! "
            f"{filt}theoraenc ! oggmux ! filesink location={out}"
        )
        return str(out)

    orig = enc("bars.ogv")
    rescaled = enc(
        "bars_rescaled.ogv",
        "videoscale ! video/x-raw,width=144,height=108 ! videoconvert ! ",
    )
    other = str(tmp_path / "ball.ogv")
    gst_ctypes.run_pipeline_to_eos(
        f"videotestsrc num-buffers=72 pattern=ball ! "
        f"video/x-raw,width={W},height={H},framerate={FPS}/1 ! "
        f"theoraenc ! oggmux ! filesink location={other}"
    )

    be.force_backend("gstreamer")
    try:
        hb = vdf.VideoHashBuilder()
        hashes = [hb.hash(p) for p in (orig, rescaled, other)]
    finally:
        be.force_backend(None)
    assert all(h.duration == 3 for h in hashes)
    assert hashes[0].normalized_hamming_distance(hashes[1]) < 0.2
    assert hashes[0].normalized_hamming_distance(hashes[2]) > 0.35
    groups = vdf.search(hashes, vdf.DEFAULT_SEARCH_TOLERANCE)
    assert len(groups) == 1
    assert sorted(map(os.path.basename, groups[0].duplicates)) == [
        "bars.ogv",
        "bars_rescaled.ogv",
    ]


def test_live_cli_decode_backend_flag(tmp_path):
    """Full CLI run with --decode-backend gstreamer over theora-only
    videos: walk -> cache -> batched hash -> search -> JSON output.
    The runtime equivalent of rebuilding the reference with its
    gstreamer_backend cargo feature."""
    import json

    from vid_dup_finder_lib_tpu.app import run_app
    from vid_dup_finder_lib_tpu.ingest import backend as be

    vids = tmp_path / "vids"
    vids.mkdir()

    def enc(name, filt=""):
        gst_ctypes.run_pipeline_to_eos(
            f"videotestsrc num-buffers=72 pattern=smpte ! "
            f"video/x-raw,width={W},height={H},framerate={FPS}/1 ! "
            f"{filt}theoraenc ! oggmux ! filesink location={vids / name}"
        )

    enc("bars.ogv")
    enc(
        "bars_rescaled.ogv",
        "videoscale ! video/x-raw,width=144,height=108 ! videoconvert ! ",
    )
    gst_ctypes.run_pipeline_to_eos(
        f"videotestsrc num-buffers=72 pattern=ball ! "
        f"video/x-raw,width={W},height={H},framerate={FPS}/1 ! "
        f"theoraenc ! oggmux ! filesink location={vids / 'ball.ogv'}"
    )

    out = tmp_path / "out.json"
    import contextlib

    with open(out, "w") as fh, contextlib.redirect_stdout(fh):
        rc = run_app(
            [
                "--files", str(vids),
                "--decode-backend", "gstreamer",
                "--output-format", "json",
                "--cache-file", str(tmp_path / "cache.json"),
            ]
        )
    assert rc == 0
    assert be._FORCED_BACKEND is None  # restored after the run
    groups = json.loads(out.read_text())
    assert len(groups) == 1
    assert sorted(map(os.path.basename, groups[0]["duplicates"])) == [
        "bars.ogv",
        "bars_rescaled.ogv",
    ]


def test_ctypes_backend_is_not_auto_default():
    """Without gi, the ctypes gstreamer backend must NOT preempt
    ffmpeg/OpenCV in auto selection (minimal plugin sets cannot demux
    mp4); it is listed last."""
    from vid_dup_finder_lib_tpu.ingest import backend as be
    from vid_dup_finder_lib_tpu.ingest.gstreamer_reader import (
        available_kind,
    )

    if available_kind() != "ctypes":
        pytest.skip("gi present; ordering rule not applicable")
    avail = be.available_backends()
    assert avail[-1] == "gstreamer"
    if len(avail) > 1:
        assert be._pick_backend() != "gstreamer"
