"""Real-content parity evidence: the reference's own bundled videos.

The closest achievable step to ground-truth parity without a Rust
toolchain (VERDICT round 1, next-step 3): hash the videos bundled with
the reference with default options and assert

* the duplicate-group behavior the reference example asserts
  (``vid_dup_finder_lib/examples/example.rs:77-82``: EXACTLY two groups
  of three — cat.{1,2,3} and dog.{1,2,3}).  cat.2/dog.2 are AV1, which
  no stock decoder in this image handles; they decode through the
  in-repo mp4 demux + dav1d ctypes path (``ingest/av1_reader.py``), so
  with dav1d present the FULL 6-video example runs; without it the
  4-video subset asserts the same shape at 2x2, and
* bit-exact reproduction of the hashes frozen in
  ``tests/oracles/reference_vids_hashes.json`` — the cross-round
  regression oracle for the full decode->crop->resize->DCT pipeline on
  real content.
"""

import json
import os

import pytest

from vid_dup_finder_lib_tpu.video_hash import VideoHash

_REF_VIDS = "/root/reference/vid_dup_finder_lib/examples/vids"
_CV_DECODABLE = ["cat.1.mp4", "cat.3.webm", "dog.1.mp4", "dog.3.webm"]
_AV1 = ["cat.2.mp4", "dog.2.mp4"]
_ORACLE = os.path.join(os.path.dirname(__file__), "oracles", "reference_vids_hashes.json")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(_REF_VIDS), reason="reference videos not available"
)


def _have_av1() -> bool:
    from vid_dup_finder_lib_tpu.ingest.av1_reader import can_read

    return can_read(os.path.join(_REF_VIDS, _AV1[0]))


@pytest.fixture(scope="module")
def ref_hashes():
    from vid_dup_finder_lib_tpu.models.builder import VideoHashBuilder

    vids = _CV_DECODABLE + (_AV1 if _have_av1() else [])
    hb = VideoHashBuilder()
    return {v: hb.hash(os.path.join(_REF_VIDS, v)) for v in vids}


def test_reference_vids_group_like_the_reference_example(ref_hashes):
    """example.rs:77-82: one all-cat group, one all-dog group — the
    full two-groups-of-THREE assertion when AV1 decode is available."""
    import vid_dup_finder_lib_tpu as vdf

    groups = vdf.search(list(ref_hashes.values()))
    names = sorted(
        tuple(sorted(os.path.basename(p) for p in g.contained_paths()))
        for g in groups
    )
    if len(ref_hashes) == 6:
        assert names == [
            ("cat.1.mp4", "cat.2.mp4", "cat.3.webm"),
            ("dog.1.mp4", "dog.2.mp4", "dog.3.webm"),
        ]
    else:
        assert names == [
            ("cat.1.mp4", "cat.3.webm"),
            ("dog.1.mp4", "dog.3.webm"),
        ]


def test_reference_vids_distances(ref_hashes):
    """Intra-group distances are far under tolerance; cross-group far
    over (the separation the reference's default tolerance relies on)."""
    hs = ref_hashes
    cats = [v for v in hs if v.startswith("cat")]
    dogs = [v for v in hs if v.startswith("dog")]
    for grp in (cats, dogs):
        for i, a in enumerate(grp):
            for b in grp[i + 1 :]:
                assert hs[a].normalized_hamming_distance(hs[b]) < 0.10
    for a in cats:
        for b in dogs:
            assert hs[a].normalized_hamming_distance(hs[b]) > 0.40


def test_reference_doctest_frame_count():
    """vid_frame_iter's doc-test decodes dog.1.mp4 at native fps and
    asserts exactly 1080 frames (vid_frame_iter/src/lib.rs:33-45); the
    facade must deliver the same count."""
    from vid_dup_finder_lib_tpu.ingest.backend import FrameReadCfg

    cfg = FrameReadCfg.from_path(os.path.join(_REF_VIDS, "dog.1.mp4"))
    assert sum(1 for _ in cfg.spawn_gray()) == 1080


def test_resize_lsb_sensitivity_on_real_content(ref_hashes):
    """Resize-rounding robustness margin on real content (historically
    the PARITY deviation-1 evidence; the deviation itself was closed in
    round 3 by implementing the u8 fixed-point path, but the margin
    argument stays valuable): random +/-1 perturbations of the resized
    16x16x16 cubes of the reference's own videos must leave group
    decisions intact — perturbed hashes stay far under tolerance to
    their original, far over to the other group."""
    import numpy as np

    from vid_dup_finder_lib_tpu.models.builder import (
        CreationOptions,
        prepare_frames,
    )
    from vid_dup_finder_lib_tpu.ops.golden import hash_bits_golden
    from vid_dup_finder_lib_tpu.video_hash import VideoHash, pack_bits

    rng = np.random.default_rng(17)
    originals = {}
    perturbed = {}
    for v in _CV_DECODABLE:
        cube, dur = prepare_frames(
            os.path.join(_REF_VIDS, v), CreationOptions()
        )
        originals[v] = VideoHash(
            pack_bits(hash_bits_golden(cube)), v, dur
        )
        variants = []
        for _ in range(5):
            delta = rng.integers(-1, 2, cube.shape).astype(np.int16)
            pcube = np.clip(
                cube.astype(np.int16) + delta, 0, 255
            ).astype(np.uint8)
            variants.append(
                VideoHash(pack_bits(hash_bits_golden(pcube)), v, dur)
            )
        perturbed[v] = variants

    for v in _CV_DECODABLE:
        for p in perturbed[v]:
            # +/-1 on every pixel flips only near-zero DCT signs
            assert originals[v].normalized_hamming_distance(p) < 0.15
    for a in ("cat.1.mp4", "cat.3.webm"):
        for b in ("dog.1.mp4", "dog.3.webm"):
            for p in perturbed[a]:
                assert p.normalized_hamming_distance(originals[b]) > 0.35


def test_reference_vids_hashes_frozen(ref_hashes):
    """Bit-exact against the frozen oracle: any drift in decode, frame
    selection, crop, resize, or DCT shows up here."""
    with open(_ORACLE) as f:
        frozen = json.load(f)
    for v, h in ref_hashes.items():
        exp = VideoHash.from_json(frozen[v])
        assert h.duration == exp.duration, v
        assert h.hamming_distance(exp) == 0, v
