"""AV1 ingest: mp4 demux (`ingest/mp4_av1`) + dav1d ctypes decode
(`ingest/dav1d_ctypes`) + the reader (`ingest/av1_reader`).

The reference's bundled cat.2/dog.2 are AV1 (youtube format 394,
``examples/obtain_videos.sh:24``) and undecodable by every stock
backend in this image; these tests pin the in-repo path end to end
against the real files.  Skipped where libdav1d or the reference videos
are absent.
"""

from __future__ import annotations

import os

import numpy as np
import pytest

from vid_dup_finder_lib_tpu.errors import VidProc
from vid_dup_finder_lib_tpu.ingest import dav1d_ctypes, mp4_av1
from vid_dup_finder_lib_tpu.ingest.av1_reader import Av1FrameReader, can_read

_REF_VIDS = "/root/reference/vid_dup_finder_lib/examples/vids"
_CAT2 = os.path.join(_REF_VIDS, "cat.2.mp4")
_DOG2 = os.path.join(_REF_VIDS, "dog.2.mp4")

pytestmark = pytest.mark.skipif(
    not (dav1d_ctypes.available() and os.path.exists(_CAT2)),
    reason="libdav1d or reference videos unavailable",
)


def test_mp4_parse_fields():
    t = mp4_av1.parse_av1_mp4(_CAT2)
    assert (t.width, t.height) == (256, 144)
    assert t.n_samples == 1125
    assert t.fps == pytest.approx(25.0)
    assert t.duration == pytest.approx(44.96, abs=0.01)
    # single-chunk layout: spans are contiguous
    offs = t.sample_spans
    for (o1, s1), (o2, _) in zip(offs, offs[1:]):
        assert o2 == o1 + s1

    d = mp4_av1.parse_av1_mp4(_DOG2)
    assert d.n_samples == 1079
    assert d.fps == pytest.approx(24000 / 1001)


def test_sniff():
    assert mp4_av1.is_av1_mp4(_CAT2)
    # h264 mp4 and webm are not av01-in-mp4
    assert not mp4_av1.is_av1_mp4(os.path.join(_REF_VIDS, "cat.1.mp4"))
    assert not mp4_av1.is_av1_mp4(os.path.join(_REF_VIDS, "cat.3.webm"))
    assert can_read(_CAT2)


def test_mp4_multi_chunk_stsc_layout(tmp_path):
    """The reference AV1 files are single-chunk; pin the general stsc
    run expansion on a synthetic multi-chunk file: run (first_chunk=1,
    2/chunk) then (first_chunk=2, 1/chunk) over 4 chunks."""
    import struct

    def box(typ, payload):
        return struct.pack(">I4s", 8 + len(payload), typ) + payload

    def full(typ, ver_flags, payload):
        return box(typ, struct.pack(">I", ver_flags) + payload)

    sizes = [10, 20, 30, 40, 50]
    stsz = full(
        b"stsz", 0, struct.pack(">II", 0, 5) + struct.pack(">5I", *sizes)
    )
    stco = full(
        b"stco",
        0,
        struct.pack(">I", 4) + struct.pack(">4I", 1000, 2000, 3000, 4000),
    )
    stsc = full(
        b"stsc",
        0,
        struct.pack(">I", 2)
        + struct.pack(">III", 1, 2, 1)
        + struct.pack(">III", 2, 1, 1),
    )
    stts = full(b"stts", 0, struct.pack(">I", 1) + struct.pack(">II", 5, 512))
    av01 = box(
        b"av01", b"\x00" * 24 + struct.pack(">HH", 64, 48) + b"\x00" * 50
    )
    stsd = full(b"stsd", 0, struct.pack(">I", 1) + av01)
    stbl = box(b"stbl", stsd + stts + stsz + stco + stsc)
    hdlr = full(b"hdlr", 0, b"\x00" * 4 + b"vide" + b"\x00" * 12)
    mdhd = full(b"mdhd", 0, struct.pack(">IIII", 0, 0, 12800, 2560))
    mdia = box(b"mdia", mdhd + hdlr + box(b"minf", stbl))
    moov = box(b"moov", box(b"trak", mdia))
    p = tmp_path / "synth.mp4"
    p.write_bytes(box(b"ftyp", b"isom\x00\x00\x02\x00isomav01") + moov)

    t = mp4_av1.parse_av1_mp4(str(p))
    assert (t.width, t.height) == (64, 48)
    assert t.fps == pytest.approx(25.0)
    assert t.sample_spans == [
        (1000, 10), (1010, 20), (2000, 30), (3000, 40), (4000, 50),
    ]


def test_sniff_rejects_garbage(tmp_path):
    p = tmp_path / "junk.mp4"
    p.write_bytes(b"\x00\x00\x00\x08ftypgarbage" * 100)
    assert not mp4_av1.is_av1_mp4(str(p))


def test_parse_malformed_tables_raise_vidproc(tmp_path):
    """An adversarial stsz count past the buffer must surface as
    VidProc (builder error-caching depends on it), not struct.error."""
    import struct

    def box(typ, payload):
        return struct.pack(">I4s", 8 + len(payload), typ) + payload

    def full(typ, vf, payload):
        return box(typ, struct.pack(">I", vf) + payload)

    stsz = full(b"stsz", 0, struct.pack(">II", 0, 10**9))
    av01 = box(
        b"av01", b"\x00" * 24 + struct.pack(">HH", 64, 48) + b"\x00" * 50
    )
    stsd = full(b"stsd", 0, struct.pack(">I", 1) + av01)
    stts = full(b"stts", 0, struct.pack(">I", 1) + struct.pack(">II", 5, 512))
    stbl = box(b"stbl", stsd + stts + stsz)
    hdlr = full(b"hdlr", 0, b"\x00" * 4 + b"vide" + b"\x00" * 12)
    mdhd = full(b"mdhd", 0, struct.pack(">IIII", 0, 0, 12800, 2560))
    mdia = box(b"mdia", mdhd + hdlr + box(b"minf", stbl))
    p = tmp_path / "adv.mp4"
    p.write_bytes(box(b"ftyp", b"isom") + box(b"moov", box(b"trak", mdia)))
    with pytest.raises(VidProc):
        mp4_av1.parse_av1_mp4(str(p))
    # the cheap sniff (moov-only, no table walk) may still say av01 —
    # the reader then surfaces the parse VidProc into error caching
    from vid_dup_finder_lib_tpu.ingest.av1_reader import Av1FrameReader

    with pytest.raises(VidProc):
        list(Av1FrameReader(str(p)).frames())


def test_parser_fuzz_never_crashes(tmp_path):
    """Random box soup and bit-flipped real files only ever raise
    VidProc (300-case sweep ran during development; a quick seeded
    subset stays in CI)."""
    rng = np.random.default_rng(7)
    p = tmp_path / "fuzz.mp4"
    for _ in range(40):
        buf = bytearray(
            rng.integers(0, 256, int(rng.integers(16, 2048)), dtype=np.uint8)
            .tobytes()
        )
        buf[4:8] = b"ftyp"
        p.write_bytes(bytes(buf))
        mp4_av1.is_av1_mp4(str(p))  # bool, never raises
        try:
            mp4_av1.parse_av1_mp4(str(p))
        except VidProc:
            pass
    real = open(_CAT2, "rb").read()
    for _ in range(15):
        b = bytearray(real)
        for _ in range(20):
            b[int(rng.integers(len(b)))] = int(rng.integers(256))
        p.write_bytes(bytes(b))
        try:
            mp4_av1.parse_av1_mp4(str(p))
        except VidProc:
            pass


def test_full_decode_count_and_content():
    frames = list(Av1FrameReader(_CAT2).frames())
    assert len(frames) == 1125
    f = frames[200]
    assert f.shape == (144, 256) and f.dtype == np.uint8
    # real content, full-range expanded (not raw limited-range luma)
    assert f.max() > 235 or f.min() < 16 or f.std() > 5


def test_decode_determinism():
    a = list(Av1FrameReader(_CAT2, num_frames=40).frames())
    b = list(Av1FrameReader(_CAT2, num_frames=40).frames())
    for x, y in zip(a, b):
        assert np.array_equal(x, y)


def test_fps_resample_matches_opencv_semantics():
    """Slot selection must equal OpenCvFrameReader's arithmetic: the
    builder's (fps*16384, 16384) fractions land on identical source
    indices whichever backend decodes."""
    fps = (64 * 16384 // 10, 16384)  # the builder's 6.4 fps class
    frames = list(Av1FrameReader(_CAT2, fps=fps).frames())
    num, den = fps
    src_fps, n_src = 25.0, 1125
    expect = 0
    k = 0
    while True:
        idx = int(round(k * (den / num) * src_fps))
        if idx >= n_src:
            break
        expect += 1
        k += 1
    assert len(frames) == expect


def test_seek_start_offset():
    all_frames = list(Av1FrameReader(_CAT2, num_frames=300).frames())
    seeked = list(
        Av1FrameReader(_CAT2, start_offset=10.0, num_frames=5).frames()
    )
    assert np.array_equal(seeked[0], all_frames[250])  # 10 s @ 25 fps


def test_rgb_output():
    rgb = next(
        iter(Av1FrameReader(_CAT2, grayscale=False, num_frames=1).frames())
    )
    assert rgb.shape == (144, 256, 3) and rgb.dtype == np.uint8


def test_facade_routes_av1_through_opencv_backend():
    """FrameReadCfg's auto/opencv path must transparently decode AV1
    (the delegation in backend._spawn)."""
    from vid_dup_finder_lib_tpu.ingest.backend import FrameReadCfg

    cfg = FrameReadCfg.from_path(_CAT2)
    cfg.set_fps((25 * 16384, 16384))
    it = cfg.spawn_gray()
    first = next(iter(it))
    assert first.shape == (144, 256)


def test_probe_av1_container_tier(monkeypatch):
    """VideoInfo's fourth tier reads duration/dims from the mp4
    container when ffprobe, OpenCV, and gst are all unavailable."""
    from vid_dup_finder_lib_tpu.errors import NotVideo
    from vid_dup_finder_lib_tpu.ingest import probe

    def boom(_):
        raise NotVideo()

    monkeypatch.setattr(probe, "ffprobe_available", lambda: False)
    monkeypatch.setattr(
        probe.VideoInfo, "_from_opencv", staticmethod(boom)
    )
    monkeypatch.setattr(probe.VideoInfo, "_from_gst", staticmethod(boom))
    info = probe.VideoInfo.new(_CAT2)
    assert info.resolution == (256, 144)
    assert info.duration == pytest.approx(44.96, abs=0.01)


def test_decoder_yields_nothing_for_non_av1_bytes():
    """Garbage OBUs either error or decode to zero frames — never to
    silent wrong pictures (the ABI validation would catch a mismatched
    geometry)."""
    try:
        frames = list(
            dav1d_ctypes.decode_frames(
                [b"\x00" * 100], expect_w=16, expect_h=16
            )
        )
    except VidProc:
        return
    assert frames == []
