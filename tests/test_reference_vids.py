"""Real-content parity evidence: the reference's own bundled videos.

The closest achievable step to ground-truth parity without a Rust
toolchain (VERDICT round 1, next-step 3): hash the 4 OpenCV-decodable
videos bundled with the reference (cat.2/dog.2 are AV1 — undecodable on
this machine) with default options and assert

* the duplicate-group behavior the reference example asserts
  (``vid_dup_finder_lib/examples/example.rs:77-82``: the cat vids group
  together, the dog vids group together, nothing crosses), and
* bit-exact reproduction of the hashes frozen in
  ``tests/data/reference_vids_hashes.json`` — the cross-round
  regression oracle for the full decode->crop->resize->DCT pipeline on
  real content.
"""

import json
import os

import pytest

from vid_dup_finder_lib_tpu.video_hash import VideoHash

_REF_VIDS = "/root/reference/vid_dup_finder_lib/examples/vids"
_DECODABLE = ["cat.1.mp4", "cat.3.webm", "dog.1.mp4", "dog.3.webm"]
_ORACLE = os.path.join(os.path.dirname(__file__), "oracles", "reference_vids_hashes.json")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(_REF_VIDS), reason="reference videos not available"
)


@pytest.fixture(scope="module")
def ref_hashes():
    from vid_dup_finder_lib_tpu.models.builder import VideoHashBuilder

    hb = VideoHashBuilder()
    return {v: hb.hash(os.path.join(_REF_VIDS, v)) for v in _DECODABLE}


def test_reference_vids_group_like_the_reference_example(ref_hashes):
    """example.rs:77-82: one all-cat group, one all-dog group."""
    import vid_dup_finder_lib_tpu as vdf

    groups = vdf.search(list(ref_hashes.values()))
    names = sorted(
        tuple(sorted(os.path.basename(p) for p in g.contained_paths()))
        for g in groups
    )
    assert names == [
        ("cat.1.mp4", "cat.3.webm"),
        ("dog.1.mp4", "dog.3.webm"),
    ]


def test_reference_vids_distances(ref_hashes):
    """Intra-pair distances are far under tolerance; cross-pairs far over
    (the separation the reference's default tolerance relies on)."""
    hs = ref_hashes
    for a, b in [("cat.1.mp4", "cat.3.webm"), ("dog.1.mp4", "dog.3.webm")]:
        assert hs[a].normalized_hamming_distance(hs[b]) < 0.10
    for a in ("cat.1.mp4", "cat.3.webm"):
        for b in ("dog.1.mp4", "dog.3.webm"):
            assert hs[a].normalized_hamming_distance(hs[b]) > 0.40


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
    for v in _DECODABLE:
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

    for v in _DECODABLE:
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
