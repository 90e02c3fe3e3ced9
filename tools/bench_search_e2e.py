"""End-to-end PUBLIC-API search benchmark: VideoHash objects -> groups.

Measures what a user of the reference actually calls
(``vid_dup_finder_lib::search``, lib.rs:132-145): build a Search over n
VideoHash objects and run ``search_self`` — matrix build + upload +
banded sweep + host group replay, everything included.  The kernel-only
numbers live in BENCH_SCALE_*; this pins the object-API overhead around
them (round 4: the replay was a hidden all-n Python loop costing ~4.6 s
at 1M, now candidate-rows-only; hashes_to_matrix was an np.stack of n
arrays, now one bytes-join).

Prints one JSON line per measured point.

Env: VDF_E2E_N (default 1_000_000), VDF_E2E_BACKEND (default auto),
VDF_E2E_ITERS (default 2; the search is re-run on a fresh Search with
the SAME entries — compile caches warm, library re-uploads each time
unless the backend keeps state), VDF_E2E_DEVLIB=1 (attach an
IncrementalDeviceLibrary with rows appended pre-sorted: the public
``search(device_library=...)`` path — the one-time append h2d is timed
separately as setup; each search then builds its sweep state zero-copy
from the resident rows, round-4 VERDICT weak #1).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from vid_dup_finder_lib_tpu.utils.jaxconfig import (  # noqa: E402
    enable_compilation_cache,
)
from vid_dup_finder_lib_tpu.video_hash import VideoHash  # noqa: E402

_BENCH_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _BENCH_DIR)
from bench import (  # noqa: E402
    CLUSTER_SIZE,
    N_CLUSTERS,
    self_search_bounds,
    synth_library,
)

TOLERANCE = 0.35  # integer domain 350, matches bench.py's TOLERANCE_INT


def main() -> None:
    enable_compilation_cache()
    n = int(os.environ.get("VDF_E2E_N", "1000000"))
    backend = os.environ.get("VDF_E2E_BACKEND", "auto")
    iters = int(os.environ.get("VDF_E2E_ITERS", "2"))

    packed, durations, starts = synth_library(n)
    bounds = self_search_bounds(durations)
    comps = int(np.sum(np.maximum(bounds - np.arange(1, n + 1), 0)))

    t0 = time.time()
    hashes = VideoHash.many_from_packed_u32(
        packed, (f"/v/{i:08}.mp4" for i in range(n)), durations
    )
    t_objs = time.time() - t0

    from vid_dup_finder_lib_tpu.search import Search

    devlib = os.environ.get("VDF_E2E_DEVLIB") == "1"
    lib = None
    t_append = None
    if devlib:
        # one-time library residency: rows appended in the Search's
        # sorted (duration, src_path) order — synth_library rows are
        # duration-sorted and paths ascend with the row index, so the
        # insertion order IS the sorted order (zero-copy state handoff)
        from vid_dup_finder_lib_tpu.ops import hamming_pallas as hp
        from vid_dup_finder_lib_tpu.ops.hamming_pallas import (
            Geometry,
            IncrementalDeviceLibrary,
        )

        # size capacity at the STATE's real packed need (windowed/split
        # slide-room included) so state() takes the zero-copy handoff —
        # a resident-formula capacity forces a permutation gather that
        # transiently doubles the packed matrix (impossible past ~32M)
        tm, tn, rt, bt = Geometry()
        windowed = n >= int(
            os.environ.get("VDF_WINDOWED_THRESHOLD", "3000000")
        )
        if windowed and hp.should_split(n, bounds):
            n_pad = hp.split_need(n, bounds)
        elif windowed:
            n_pad = hp.windowed_need(n, bounds)
        else:
            n_pad = (
                -(-(-(-n // tm)) // rt) * rt * tm + (bt + 1) * tn
            )
        t0 = time.time()
        lib = IncrementalDeviceLibrary(capacity=n_pad)
        lib.append(packed)
        # force completion with a d2h fetch: block_until_ready can
        # return EARLY through this tunnel (CLAUDE.md), which would
        # push unfinished h2d into the first timed search
        if hasattr(lib._packed, "take_rows"):
            int(lib._packed.take_rows(np.array([0]))[0, 0])
        else:
            int(np.asarray(lib._packed[0, 0]))
        t_append = time.time() - t0

    t_sort = None

    def fresh_search():
        nonlocal t_sort
        t0 = time.time()
        s = Search(hashes)
        dt = time.time() - t0
        if t_sort is None or dt < t_sort:
            t_sort = dt  # entry sort + durations array (host)
        if lib is not None:
            s.attach_device_library(lib, None)
        return s

    best = None
    groups = None
    for _ in range(iters):
        s = fresh_search()
        t0 = time.time()
        groups = s.search_self(TOLERANCE, backend=backend)
        dt = time.time() - t0
        if best is None or dt < best:
            best = dt
    # phase split on one warm fresh twin: adjacency (matrix build +
    # upload + device sweep) vs group replay
    s2 = fresh_search()
    t0 = time.time()
    s2._ensure_adjacency(int(TOLERANCE * 1000), backend)
    t_adj = time.time() - t0
    t0 = time.time()
    s2.search_self(TOLERANCE, backend=backend)
    t_replay = time.time() - t0

    # planted clusters must come back as groups: CLUSTER_SIZE consecutive
    # rows share a duration window and sit pairwise <= 120 bits apart
    by_first = {min(g): sorted(g) for g in groups}
    missing = 0
    for st in starts:
        want = sorted(f"/v/{i:08}.mp4" for i in range(st, st + CLUSTER_SIZE))
        got = by_first.get(want[0])
        if got != want:
            missing += 1
    assert missing == 0, f"{missing}/{N_CLUSTERS} planted clusters wrong"

    print(
        json.dumps(
            {
                "metric": f"search_e2e_secs@{n}"
                + ("_devlib" if devlib else ""),
                "value": round(best, 3),
                "unit": (
                    "s (objects->groups, resident sweep+replay)"
                    if devlib
                    else "s (objects->groups, matrix+upload+sweep+replay)"
                ),
                "comps_per_s": round(comps / best, 1),
                "groups": len(groups),
                "backend": backend,
                "iters": iters,
                "obj_build_secs_untimed": round(t_objs, 2),
                "search_ctor_sort_secs": (
                    round(t_sort, 2) if t_sort is not None else None
                ),
                "lib_append_secs_untimed": (
                    round(t_append, 2) if t_append is not None else None
                ),
                "adjacency_secs": round(t_adj, 3),
                "replay_secs": round(t_replay, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
