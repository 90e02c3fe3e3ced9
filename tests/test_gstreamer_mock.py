"""Mock-gi unit tests for the dormant GStreamer backend.

No PyGObject exists on this machine, so ``ingest/gstreamer_reader.py``
(the reference's *default* decode backend, frame_iter.rs:59-347) would
otherwise ship with zero logic coverage.  A fake ``gi`` module records
the pipeline string, the seek call, and the state transitions, and
serves synthetic samples with a padded stride — validating pipeline
construction, accurate-seek flags, stride cropping, and teardown
ordering against the reference's behavior."""

import sys
import types

import numpy as np
import pytest

W, H, NFRAMES = 32, 24, 4
STRIDE = 48  # > W: exercises the row-stride crop


class _FakeInfo:
    def __init__(self, data: bytes) -> None:
        self.data = data


class _FakeBuffer:
    def __init__(self, data: bytes) -> None:
        self._data = data
        self.mapped = False
        self.unmapped = False

    def map(self, flags):
        self.mapped = True
        return True, _FakeInfo(self._data)

    def unmap(self, info) -> None:
        self.unmapped = True


class _FakeStructure:
    def get_value(self, key):
        return {"width": W, "height": H}[key]


class _FakeCaps:
    def get_structure(self, i):
        return _FakeStructure()


class _FakeSample:
    def __init__(self, k: int, rowbytes: int = STRIDE, pix: int = W) -> None:
        frame = np.full((H, rowbytes), 10 * k, dtype=np.uint8)
        frame[:, pix:] = 255  # stride padding: must be cropped away
        self._buf = _FakeBuffer(frame.tobytes())

    def get_buffer(self):
        return self._buf

    def get_caps(self):
        return _FakeCaps()


class _FakeSink:
    def __init__(self, log, rgb: bool) -> None:
        self._log = log
        self._served = 0
        self._rgb = rgb

    def emit(self, signal, timeout):
        assert signal == "try-pull-sample"
        self._log.append(("pull", timeout))
        if self._served >= NFRAMES:
            return None
        if self._rgb:
            s = _FakeSample(self._served, rowbytes=W * 3 + 16, pix=W * 3)
        else:
            s = _FakeSample(self._served)
        self._served += 1
        return s


class _FakePipeline:
    def __init__(self, log, rgb: bool) -> None:
        self._log = log
        self._rgb = rgb

    def get_by_name(self, name):
        assert name == "sink"
        return _FakeSink(self._log, self._rgb)

    def set_state(self, state):
        self._log.append(("state", state))

    def get_state(self, timeout):
        self._log.append(("get_state", timeout))

    def seek_simple(self, fmt, flags, pos):
        self._log.append(("seek", fmt, flags, pos))


def _fake_gst(log):
    gst = types.SimpleNamespace()
    gst.SECOND = 10**9
    gst.CLOCK_TIME_NONE = 2**64 - 1
    gst.Format = types.SimpleNamespace(TIME="time")
    gst.SeekFlags = types.SimpleNamespace(ACCURATE=1, FLUSH=2)
    gst.State = types.SimpleNamespace(PAUSED="paused", PLAYING="playing", NULL="null")
    gst.MapFlags = types.SimpleNamespace(READ=1)
    gst.init = lambda _: log.append(("init",))

    def parse_launch(desc):
        log.append(("launch", desc))
        return _FakePipeline(log, rgb="format=RGB" in desc)

    gst.parse_launch = parse_launch
    return gst


@pytest.fixture()
def gi_log(monkeypatch):
    log = []
    gi = types.ModuleType("gi")
    gi.require_version = lambda *a: None
    repo = types.ModuleType("gi.repository")
    repo.Gst = _fake_gst(log)
    gi.repository = repo
    monkeypatch.setitem(sys.modules, "gi", gi)
    monkeypatch.setitem(sys.modules, "gi.repository", repo)
    return log


def test_gst_pipeline_string_and_frames(gi_log):
    from vid_dup_finder_lib_tpu.ingest.gstreamer_reader import (
        GStreamerFrameReader,
    )

    r = GStreamerFrameReader("/v/x.mp4", fps=(104857, 16384))
    frames = list(r.frames())

    launch = next(e[1] for e in gi_log if e[0] == "launch")
    # pipeline mirrors frame_iter.rs:59-114
    assert "uridecodebin uri=file:///v/x.mp4" in launch
    assert "videorate" in launch
    assert "framerate=104857/16384" in launch
    assert "appsink name=sink" in launch
    assert "format=GRAY8" in launch

    assert len(frames) == NFRAMES
    for k, f in enumerate(frames):
        assert f.shape == (H, W)  # stride padding cropped
        assert (f == 10 * k).all()


def test_gst_seek_flags_and_state_order(gi_log):
    from vid_dup_finder_lib_tpu.ingest.gstreamer_reader import (
        GStreamerFrameReader,
    )

    r = GStreamerFrameReader("/v/x.mp4", start_offset=7.5)
    list(r.frames())
    events = [e for e in gi_log if e[0] in ("state", "seek")]
    # PAUSED -> accurate flushing seek -> PLAYING -> ... -> NULL
    assert events[0] == ("state", "paused")
    assert events[1][0] == "seek"
    _, fmt, flags, pos = events[1]
    assert fmt == "time" and flags == 3  # ACCURATE | FLUSH
    assert pos == int(7.5 * 10**9)
    assert events[2] == ("state", "playing")
    assert events[-1] == ("state", "null")  # teardown, frame_iter.rs:335


def test_gst_teardown_on_error(gi_log, monkeypatch):
    """NULL-state teardown runs even when a buffer map fails."""
    from vid_dup_finder_lib_tpu.errors import VidProc
    from vid_dup_finder_lib_tpu.ingest.gstreamer_reader import (
        GStreamerFrameReader,
    )

    monkeypatch.setattr(
        _FakeBuffer, "map", lambda self, flags: (False, None)
    )
    r = GStreamerFrameReader("/v/x.mp4")
    with pytest.raises(VidProc, match="map failed"):
        list(r.frames())
    assert gi_log[-1] == ("state", "null")


def test_gst_no_fps_means_no_videorate_caps(gi_log):
    from vid_dup_finder_lib_tpu.ingest.gstreamer_reader import (
        GStreamerFrameReader,
    )

    list(GStreamerFrameReader("/v/x.mp4", grayscale=False).frames())
    launch = next(e[1] for e in gi_log if e[0] == "launch")
    assert "framerate" not in launch
    assert "format=RGB" in launch
