"""Library usage example.

Python equivalent of the reference's bundled example
(``vid_dup_finder_lib/examples/example.rs``): hash a directory of videos,
search for duplicates at the default tolerance, print the groups, and
assert the expected 2 groups of 3 when run against the test fixtures.

Run:  python examples/example.py [video_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import vid_dup_finder_lib_tpu as vdf  # noqa: E402
from vid_dup_finder_lib_tpu.models.pipeline import hash_videos  # noqa: E402


def main() -> None:
    if len(sys.argv) > 1:
        vid_dir = sys.argv[1]
        paths = sorted(
            os.path.join(vid_dir, f)
            for f in os.listdir(vid_dir)
            if f.split(".")[-1].lower() in ("mp4", "mkv", "webm", "avi")
        )
    else:
        # prefer the reference's own bundled videos (the exact inputs of
        # example.rs — the AV1 pair decodes via ingest/av1_reader);
        # generated fixtures otherwise
        ref_vids = "/root/reference/vid_dup_finder_lib/examples/vids"
        if os.path.isdir(ref_vids):
            paths = sorted(
                os.path.join(ref_vids, f) for f in os.listdir(ref_vids)
            )
        else:
            from tests.fixtures import make_fixture_videos

            paths = make_fixture_videos(
                os.path.join(
                    os.path.dirname(__file__), "..", "tests", "data"
                )
            )

    # the batched device pipeline; VideoHashBuilder().hash(p) is the
    # one-at-a-time equivalent
    results = hash_videos(paths)
    hashes = [h for h in results.values() if isinstance(h, vdf.VideoHash)]
    errors = {p: e for p, e in results.items() if not isinstance(e, vdf.VideoHash)}
    for p, e in errors.items():
        print(f"skipped {p}: {e}", file=sys.stderr)

    groups = vdf.search(hashes, vdf.DEFAULT_SEARCH_TOLERANCE)
    for i, group in enumerate(groups):
        print(f"group {i}:")
        for p in group.duplicates:
            print(f"  {p}")

    if len(sys.argv) == 1:
        # the reference example's assertion (example.rs:77-82)
        assert len(groups) == 2, f"expected 2 groups, got {len(groups)}"
        assert all(len(g) == 3 for g in groups)
        print("OK: 2 duplicate groups of 3")


if __name__ == "__main__":
    main()
