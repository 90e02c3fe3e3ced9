"""Pallas TPU kernel: tiled Hamming adjacency.

One fused kernel launch covers a CHUNK of R_TILES row tiles x BAND_TILES
column tiles, with each row tile's column window positioned independently
via scalar prefetch (each row's duration band starts at a different column):

    int8 +/-1 operands (VDF_PM_DTYPE; exact int32 accum — bf16/f32
    selectable) -> MXU matmul -> distance -> tolerance + duration-window
    mask (skipped on interior tiles) -> on-chip bitpack (two exact bf16
    MXU matmuls against constant 16-bit-group pack matrices)
    -> int32 adjacency words (1 bit per pair) + per-tile match count

Why Pallas instead of the XLA path in ``hamming.py``: the XLA kernel
materializes the int32 distance tile in HBM (4 bytes/pair) before the
threshold; this kernel writes 1 *bit*/pair — a 32x HBM-write saving —
and a per-tile match count so the host only transfers tiles that actually
contain matches (virtually none do on real libraries; device->host
bandwidth through the tunnel is the scarcest resource here).

Blocks are indexed via scalar prefetch, so the kernel DMAs row/column
tiles straight out of the full HBM-resident +/-1 matrix with no host-side
slicing, a 256-tile chunk runs as ONE device program (dispatch latency
matters), and all launches share a single compiled shape (remote compiles
cost minutes).

The bitpack is transposed — output word [r, c] packs rows r*32..r*32+31 of
column c — keeping the lane dimension at TILE_N.
"""

from __future__ import annotations

import functools
import os
import sys
import time
import typing

import numpy as np

from ..definitions import HASH_BITS_PADDED

# Tile geometry (env-overridable for perf experiments; the defaults are
# the measured-best on v5e — see ARCHITECTURE.md perf log).
# TILE_M x TILE_N is one distance tile; a launch covers an R_TILES x
# BAND_TILES grid of them.  Mosaic compile time through the remote helper
# scales with grid size (~7.5 s/step, one-time + persistently cached);
# per-LAUNCH dispatch overhead (~0.45 ms via lax.scan) is what a bigger
# grid amortizes away.
# +/-1 operand dtype: int8 halves the column-tile DMA and pm1 footprint
# vs bf16, and v5e's int8 MXU path is 2x the bf16 rate; both are exact
# (int32 / f32 accumulation over +/-1 operands).
PM_DTYPE = os.environ.get("VDF_PM_DTYPE", "int8")

# Round-3 kernel experiments, MEASURED at 1M on v5e (ARCHITECTURE.md
# round-3 perf log) — both LOST and default OFF, kept for re-testing on
# other hardware:
# VDF_COLT=1 stores a TRANSPOSED [1024, n] copy of the +/-1 matrix for
# the counts kernel's column operand (plain [M, K] x [K, N] MXU dot, no
# per-tile rhs relayout) — neutral (0.39 s vs 0.38 s counts drain):
# Mosaic already absorbs the rhs-contraction layout.  VDF_COUNTS_INTERIOR=1
# gives the counts kernel the packing kernel's interior-tile fast path —
# NEGATIVE (0.46 s vs 0.38 s): the per-step lax.cond costs more than the
# mask VPU passes it skips.
COLT = os.environ.get("VDF_COLT") == "1"
# "0" off (default), "1" lax.cond variant, "2" pl.when variant
COUNTS_INTERIOR = os.environ.get("VDF_COUNTS_INTERIOR", "0")

# TILE_M=1024 (round 3): 2x MACs per grid step amortizes the fixed
# per-step cost — 1M resident sweep 0.588 -> 0.573 s vs TILE_M=512;
# TILE_N=2048 / BAND_TILES=32 / PHASE_B_CALLS=256 all measured worse
# (ARCHITECTURE.md round-3 perf log)
TILE_M = int(os.environ.get("VDF_TILE_M", "1024"))
TILE_N = int(os.environ.get("VDF_TILE_N", "1024"))
R_TILES = int(os.environ.get("VDF_R_TILES", "1"))
BAND_TILES = int(os.environ.get("VDF_BAND_TILES", "16"))

# pad-row lower-bound sentinel: no real column id ever exceeds it
_ROW_LO_SENTINEL = 2**30


class Geometry(typing.NamedTuple):
    """Kernel tile geometry as an explicit, hashable parameter.

    Threaded through every cached kernel builder and stored on search
    states (``state.geom``) instead of living only in mutable module
    globals — two geometries can now coexist in one process (e.g. the
    production tiles next to a tiny-tile dryrun, or the BAND_TILES=1
    phase-B repack next to the BAND_TILES=16 counts sweep) without
    monkeypatching + jit-cache clearing.  The defaults bind the
    VDF_TILE_M/VDF_TILE_N/VDF_R_TILES/VDF_BAND_TILES env knobs read at
    import, so ``Geometry()`` is the configured production geometry.
    """

    tile_m: int = TILE_M
    tile_n: int = TILE_N
    r_tiles: int = R_TILES
    band_tiles: int = BAND_TILES

    @property
    def n_scal(self) -> int:
        # launch-scalar vector length (layout: see N_SCAL comment above)
        return 5 + 3 * self.r_tiles

# phase breakdown of the most recent banded_adjacency_pallas sweep
# (seconds + counters) — bench.py reports it alongside the headline rate
LAST_SWEEP_PHASES: dict = {}

# launch-scalar vector length: [0] tol, [1] n (col clamp), [2] first row
# tile (operand-relative), [3 + i] first col tile per row tile,
# [3 + R + i] min_bound, [3 + 2R + i] max_row_lo, [3 + 3R] col window
# base (TILE_N units), [4 + 3R] ROW window base in TILE_M units — or -1
# to read per-row lower bounds from the row_lo operand (the refs
# search); >= 0 means row_lo is the global row index, computed in-kernel
# from an iota, so self-search states need no [w, 1] row_lo operand at
# all (at a 32M-row min-window that operand cost 1.5 GB of 128x
# lane-padded HBM)
N_SCAL = 5 + 3 * R_TILES


def _is_tpu() -> bool:
    import jax

    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


@functools.cache
def _build_chunk(interpret: bool, geom: Geometry = Geometry()):
    """Compiled sweep of R_TILES row tiles x BAND_TILES column tiles.

    scalars (int32[N_SCAL = 5 + 3 * R_TILES]):
      [0] tolerance, [1] n, [2] first row-tile index,
      [3 + i] first column-tile index for row tile i,
      [3 + R_TILES + i] min column bound over row tile i,
      [3 + 2*R_TILES + i] max row_lo over row tile i (incl. pad-row
      sentinels) — the two per-tile extrema drive the interior-tile fast
      path that skips per-element masking,
      [3 + 3*R_TILES] window base in TILE_N units: row/col tile indices
      above are RELATIVE to the resident +/-1 window (a sliding slice of
      the library for n beyond HBM; 0 when the whole matrix is resident),
      while the id masks need ABSOLUTE column ids,
      [4 + 3*R_TILES] row window base in TILE_M units, or -1: >= 0 means
      each row's lower column bound is its GLOBAL row index, computed
      from an in-kernel iota (the self-search — no [*, 1] row_lo operand
      memory at all); -1 reads per-row bounds from the row_lo operand
      (the refs search's [0.95d, 1.05d] lower edges).

    Each row's valid columns are [row_lo + 1, bounds): the self-search
    passes row_lo = the row's own global index (reproducing j > i), the
    references search passes its [0.95d, 1.05d] window's lower edge - 1
    — one compiled kernel serves both.
    """
    from ..utils.jaxconfig import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    # geometry locals shadow the module-global defaults for the closure
    TILE_M, TILE_N, R_TILES, BAND_TILES = geom

    def kernel(scal_ref, rows_ref, cols_ref, bounds_ref, row_lo_ref,
               pow_lo_ref, pow_hi_ref, out_ref):
        i = pl.program_id(0)
        j = pl.program_id(1)
        tol = scal_ref[0]
        n = scal_ref[1]
        c0 = (scal_ref[3 + i] + j + scal_ref[3 + 3 * R_TILES]) * TILE_N
        # per-row-tile extrema (host-precomputed): tiles fully inside
        # every row's window skip the per-element masks — most tiles
        # are, and the masking VPU passes cost as much as the MXU dot.
        min_bound = scal_ref[3 + R_TILES + i]
        max_row_lo = scal_ref[3 + 2 * R_TILES + i]

        a = rows_ref[...]  # [TILE_M, 1024] +/-1 (PM_DTYPE)
        b = cols_ref[...]  # [TILE_N, 1024]
        # +/-1 operands with <= 1024 terms: int8 -> int32 and
        # bf16 -> f32 accumulation are both exact on the MXU.
        acc = jnp.int32 if PM_DTYPE == "int8" else jnp.float32
        dot = jax.lax.dot_general(
            a, b,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=acc,
        )
        # dist <= tol  <=>  dot >= 1024 - 2*tol (all 1024 storage bits
        # count, like the reference's 16-word popcount)
        dot_thresh = (HASH_BITS_PADDED - 2 * tol).astype(acc)

        # max_row_lo is the pad-row sentinel (2^30) on partial tiles, so
        # interior is automatically false there
        interior = (c0 > max_row_lo) & (c0 + TILE_N <= min_bound)

        def pack_and_store(adj) -> None:
            # Transposed bitpack via MXU: word [r, c] collects rows
            # r*32..r*32+31 of column c.  Two 16-bit-group bf16 matmuls:
            # EXACT, because the operands are {0, 1} and power-of-two
            # weights <= 2^15 (all bf16-representable) and accumulation is
            # f32 — and 6x cheaper than the HIGHEST f32 pack this replaces.
            # Pack matrices are host-precomputed constants (building them
            # per grid step with iota+exp2 cost ~100us of transcendentals).
            pow_lo = pow_lo_ref[...]
            pow_hi = pow_hi_ref[...]
            adj_b = adj.astype(jnp.bfloat16)
            dims = (((1,), (0,)), ((), ()))
            lo = jax.lax.dot_general(
                pow_lo, adj_b, dims, preferred_element_type=jnp.float32
            ).astype(jnp.int32)
            hi = jax.lax.dot_general(
                pow_hi, adj_b, dims, preferred_element_type=jnp.float32
            ).astype(jnp.int32)
            out_ref[0, 0] = lo | (hi << 16)

        # pl.when (predicated regions, not lax.cond: Mosaic can't yield a
        # [TILE_M, TILE_N] vector out of a cond): interior tiles skip the
        # per-element id masks, whose VPU passes cost as much as the dot.
        @pl.when(interior)
        def _interior():
            pack_and_store(dot >= dot_thresh)

        @pl.when(jnp.logical_not(interior))
        def _boundary():
            # narrow index vectors broadcast against the tile (full [M, N]
            # int32 index matrices would blow the VMEM budget); pad rows
            # carry row_lo = 2^30 and bounds = -1, masking them out
            col_ids = c0 + jax.lax.broadcasted_iota(
                jnp.int32, (1, TILE_N), 1
            )
            row_base = scal_ref[4 + 3 * R_TILES]
            riota = jax.lax.broadcasted_iota(jnp.int32, (TILE_M, 1), 0)
            row_lo = jnp.where(
                row_base >= 0,
                (row_base + scal_ref[2] + i) * TILE_M + riota,
                row_lo_ref[...],
            )  # [TILE_M, 1]
            bounds = bounds_ref[...]  # [TILE_M, 1]
            col_limit = jnp.minimum(bounds, n)  # [TILE_M, 1]
            pack_and_store(
                (dot >= dot_thresh)
                & (col_ids > row_lo)
                & (col_ids < col_limit)
            )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(R_TILES, BAND_TILES),
        in_specs=[
            pl.BlockSpec(
                (TILE_M, HASH_BITS_PADDED),
                lambda i, j, s: (s[2] + i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (TILE_N, HASH_BITS_PADDED),
                lambda i, j, s: (s[3 + i] + j, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (TILE_M, 1),
                lambda i, j, s: (s[2] + i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (TILE_M, 1),
                lambda i, j, s: (s[2] + i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (TILE_M // 32, TILE_M),
                lambda i, j, s: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (TILE_M // 32, TILE_M),
                lambda i, j, s: (0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, TILE_M // 32, TILE_N),
            lambda i, j, s: (i, j, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )

    pow_lo_np, pow_hi_np = _pack_matrices(TILE_M)

    # raise the scoped-VMEM cap (default 16 MB) so larger tile geometries
    # compile; v5e has 128 MB of VMEM
    vmem_mb = int(os.environ.get("VDF_VMEM_LIMIT_MB", "96"))
    compiler_params = (
        None
        if interpret
        else pltpu.CompilerParams(vmem_limit_bytes=vmem_mb * 2**20)
    )

    def one_launch(scalars, rows_pm, cols_pm, bounds, row_lo):
        # rows_pm and cols_pm are usually the SAME array (self-search);
        # the ring backend passes its local row window and the parked
        # ppermute'd column block as distinct operands.
        packed = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct(
                (R_TILES, BAND_TILES, TILE_M // 32, TILE_N), jnp.int32
            ),
            compiler_params=compiler_params,
            interpret=interpret,
        )(
            scalars, rows_pm, cols_pm, bounds, row_lo,
            jnp.asarray(pow_lo_np, dtype=jnp.bfloat16),
            jnp.asarray(pow_hi_np, dtype=jnp.bfloat16),
        )
        # per-tile match counts via XLA popcount over the packed bits
        # (an in-kernel SMEM counts output serialized the grid pipeline)
        counts = jnp.sum(
            jax.lax.population_count(packed), axis=(2, 3), dtype=jnp.int32
        )
        return packed, counts

    return jax.jit(one_launch)


# Launches per device sweep call: lax.scan drives SWEEP_CALLS kernel
# launches inside ONE jit, because per-launch Python dispatch (~0.5 ms on
# this single-core host) dominated the 0.14 ms device cost of a launch.
SWEEP_CALLS = int(os.environ.get("VDF_SWEEP_CALLS", "1024"))

# Smaller precompiled batch sizes: padding a short launch list up to
# SWEEP_CALLS runs the padded launches' full DMA+MXU work for nothing,
# so the driver picks the smallest batch size that fits the remainder.
SWEEP_SIZES = (SWEEP_CALLS, 256, 64, 16)

# v4 driver granularities: launches are count-reduced on device in GROUPs,
# GROUPS_PER_FETCH groups share one d2h counts fetch, and matching tiles
# are extracted in EXTRACT_ROUND-tile device rounds (index-only fetches).
GROUP = 64
GROUPS_PER_FETCH = 16
EXTRACT_ROUND = 64
EXTRACT_PAIR_CAP = 16384


@functools.cache
def _v4_jits():
    import jax
    import jax.numpy as jnp

    @jax.jit
    def group_stack(*cs):  # GROUP x [R_TILES, BAND] -> [GROUP, R, BAND]
        return jnp.stack(cs)

    @jax.jit
    def super_stack(*gs):  # GROUPS_PER_FETCH x [GROUP, R, BAND]
        return jnp.stack(gs)

    @jax.jit
    def extract_tiles(*tiles):
        """EXTRACT_ROUND x int32[TILE_M//32, TILE_N] -> index arrays.

        One sized nonzero over the whole stacked round; only ~256 KB of
        indices travel to the host instead of 64 KB per tile."""
        t = jnp.stack(tiles)
        tu = jax.lax.bitcast_convert_type(t, jnp.uint32)
        shifts = jnp.arange(32, dtype=jnp.uint32)[None, None, :, None]
        bits = (tu[:, :, None, :] >> shifts) & jnp.uint32(1)
        hh, rr, bb, cc = jnp.nonzero(
            bits, size=EXTRACT_PAIR_CAP, fill_value=-1
        )
        return hh, rr, bb, cc

    return group_stack, super_stack, extract_tiles


def banded_adjacency_pallas_v4(
    packed: np.ndarray,
    bounds: np.ndarray,
    tolerance_int: int,
    interpret: bool | None = None,
    state: "PallasSearchState | None" = None,
) -> tuple[np.ndarray, np.ndarray]:
    """v4 driver: AOT per-launch dispatch with hierarchical device-side
    count reduction and batched index-only pair extraction.

    Same contract as ``banded_adjacency_pallas``; kept separate so the two
    drivers can be compared (VDF_BENCH_BACKEND=pallas4).
    """
    import jax
    import jax.numpy as jnp

    assert not getattr(state, "windowed", False), (
        "the v4 driver does not support windowed states"
    )
    if interpret is None:
        interpret = not _is_tpu()
    n = packed.shape[0]
    if n == 0:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    bounds = np.asarray(bounds, dtype=np.int64)
    if state is None:
        state = PallasSearchState(packed, bounds)
    geom = state.geom
    TILE_M, TILE_N, R_TILES, BAND_TILES = geom
    assert R_TILES == 1, "the v4 driver assumes single-row-tile launches"

    fn = _build_chunk(interpret, geom)
    scal0 = jnp.zeros((geom.n_scal,), jnp.int32)
    compiled = fn.lower(
        scal0, state.pm1, state.pm1, state.bounds_dev, state.row_lo_dev
    ).compile()
    group_stack, super_stack, extract_tiles = _v4_jits()

    n_row_tiles = -(-n // TILE_M)
    launches: list[tuple[int, int]] = []
    for rt in range(n_row_tiles):
        ct0 = int(state.first_ct[rt])
        remaining = int(state.n_ct[rt])
        while remaining > 0:
            launches.append((rt, ct0))
            ct0 += BAND_TILES
            remaining -= BAND_TILES

    out_i: list[np.ndarray] = []
    out_j: list[np.ndarray] = []
    hit_tiles: list[tuple[object, int, int, int, int]] = []
    zero_group = None

    def extract_pending_hits() -> None:
        """Batched index-only extraction of accumulated hit tiles."""
        nonlocal hit_tiles
        if not hit_tiles:
            return
        zero_tile = jnp.zeros((TILE_M // 32, TILE_N), jnp.int32)
        for s0 in range(0, len(hit_tiles), EXTRACT_ROUND):
            round_hits = hit_tiles[s0 : s0 + EXTRACT_ROUND]
            tiles = [p[int(i), int(j)] for (p, i, j, _, _) in round_hits]
            tiles += [zero_tile] * (EXTRACT_ROUND - len(tiles))
            hh, rr, bb, cc = (
                np.asarray(a) for a in extract_tiles(*tiles)
            )
            valid = hh >= 0
            if (~valid).sum() == 0:
                # capacity hit: fall back to per-tile fetch for this round
                for p, i, j, rbase, cbase in round_hits:
                    roff, coff = _tile_bits_to_pairs(
                        np.asarray(p[int(i), int(j)])
                    )
                    out_i.append(roff.astype(np.int64) + rbase)
                    out_j.append(coff.astype(np.int64) + cbase)
                continue
            hh, rr, bb, cc = hh[valid], rr[valid], bb[valid], cc[valid]
            rbases = np.array(
                [h[3] for h in round_hits] + [0] * (EXTRACT_ROUND - len(round_hits)),
                dtype=np.int64,
            )
            cbases = np.array(
                [h[4] for h in round_hits] + [0] * (EXTRACT_ROUND - len(round_hits)),
                dtype=np.int64,
            )
            out_i.append(rbases[hh] + rr.astype(np.int64) * 32 + bb)
            out_j.append(cbases[hh] + cc.astype(np.int64))
        hit_tiles = []

    # dispatch in super-windows; counts reduced on device, fetched once
    per_super = GROUP * GROUPS_PER_FETCH
    for w0 in range(0, len(launches), per_super):
        wlaunches = launches[w0 : w0 + per_super]
        packed_refs: list = []
        group_handles: list = []
        counts_buf: list = []
        scal = np.zeros(geom.n_scal, dtype=np.int32)
        for rt, ct0 in wlaunches:
            scal[:6] = (
                tolerance_int, n, rt, ct0,
                int(state.min_bound[rt]), int(state.max_row_lo[rt]),
            )
            p, c = compiled(
                jnp.asarray(scal), state.pm1, state.pm1, state.bounds_dev,
                state.row_lo_dev,
            )
            if interpret:
                # emulated DMA is not safe across in-flight launches
                c.block_until_ready()
            packed_refs.append(p)
            counts_buf.append(c)
            if len(counts_buf) == GROUP:
                group_handles.append(group_stack(*counts_buf))
                counts_buf = []
        if counts_buf:
            if zero_group is None:
                zero_group = jnp.zeros(
                    (R_TILES, BAND_TILES), jnp.int32
                )
            counts_buf += [zero_group] * (GROUP - len(counts_buf))
            group_handles.append(group_stack(*counts_buf))
        gpad = GROUPS_PER_FETCH - len(group_handles)
        if gpad:
            zg = jnp.zeros((GROUP, R_TILES, BAND_TILES), jnp.int32)
            group_handles += [zg] * gpad
        counts_np = np.asarray(super_stack(*group_handles))
        # counts_np: [GROUPS_PER_FETCH, GROUP, R_TILES, BAND_TILES]
        for g, k, i, j in zip(*np.nonzero(counts_np > 0)):
            idx = int(g) * GROUP + int(k)
            if idx >= len(wlaunches):
                continue
            rt, ct0 = wlaunches[idx]
            hit_tiles.append(
                (
                    packed_refs[idx], int(i), int(j),
                    (rt + int(i)) * TILE_M,
                    (ct0 + int(j)) * TILE_N,
                )
            )
        # extraction batched across windows; only hit launches keep refs
        if len(hit_tiles) >= 4 * EXTRACT_ROUND:
            extract_pending_hits()

    extract_pending_hits()
    if not out_i:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    ii = np.concatenate(out_i)
    jj = np.concatenate(out_j)
    order = np.lexsort((jj, ii))
    return ii[order], jj[order]


@functools.cache
def _build_sweep(
    interpret: bool,
    sweep_calls: int = SWEEP_CALLS,
    geom: Geometry = Geometry(),
):
    import jax

    # the scan body reuses the single-launch pallas program
    chunk_fn = _build_chunk(interpret, geom)

    @jax.jit
    def sweep(scalars_all, rows_pm, cols_pm, bounds, row_lo):
        """scalars_all: int32[sweep_calls, 4 + 3*R_TILES] -> stacked outputs."""

        def body(_, scal):
            packed, counts = chunk_fn(scal, rows_pm, cols_pm, bounds, row_lo)
            return None, (packed, counts)

        # unroll amortizes the device while-loop overhead (~0.55 ms/iter
        # measured) across several kernel launches per loop step
        _, (packed_all, counts_all) = jax.lax.scan(
            body, None, scalars_all, unroll=8
        )
        return packed_all, counts_all

    return sweep


@functools.cache
def _build_chunk_counts(
    interpret: bool,
    geom: Geometry = Geometry(),
    per_tile: bool = False,
):
    """Counts-only sweep chunk: the same tiling and window masks as
    ``_build_chunk``, but the only output is ONE int32 match count per row
    tile, accumulated across the BAND_TILES grid axis — or, with
    ``per_tile``, one count per (row tile, column tile) so the phase-B
    repack can re-run only the hit TILES with a BAND_TILES=1 geometry
    instead of whole 16-tile launch stripes.

    512 bytes of HBM writes per launch instead of ~1 MB of packed
    adjacency, so hundreds of launches can stay in flight and count
    fetches amortize arbitrarily; the rare launches that contain matches
    are recomputed afterwards with the packing kernel (phase B of
    ``banded_adjacency_pallas``).  Masks are applied unconditionally —
    the VPU mask passes measured free next to the MXU dot.
    """
    from ..utils.jaxconfig import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    TILE_M, TILE_N, R_TILES, BAND_TILES = geom

    def kernel(scal_ref, rows_ref, cols_ref, bounds_ref, row_lo_ref,
               out_ref):
        i = pl.program_id(0)
        j = pl.program_id(1)
        tol = scal_ref[0]
        n = scal_ref[1]
        c0 = (scal_ref[3 + i] + j + scal_ref[3 + 3 * R_TILES]) * TILE_N

        a = rows_ref[...]
        b = cols_ref[...]
        acc = jnp.int32 if PM_DTYPE == "int8" else jnp.float32
        # COLT: the column operand is the TRANSPOSED [1024, n] matrix, so
        # the dot contracts a's dim 1 against b's dim 0 — a plain MXU
        # matmul with no per-tile rhs relayout
        dims = (((1,), (0,)), ((), ())) if COLT else (((1,), (1,)), ((), ()))
        dot = jax.lax.dot_general(
            a, b, dimension_numbers=dims, preferred_element_type=acc
        )
        dot_thresh = (HASH_BITS_PADDED - 2 * tol).astype(acc)

        def boundary_cnt():
            col_ids = c0 + jax.lax.broadcasted_iota(
                jnp.int32, (1, TILE_N), 1
            )
            row_base = scal_ref[4 + 3 * R_TILES]
            riota = jax.lax.broadcasted_iota(jnp.int32, (TILE_M, 1), 0)
            row_lo = jnp.where(
                row_base >= 0,
                (row_base + scal_ref[2] + i) * TILE_M + riota,
                row_lo_ref[...],
            )  # [TILE_M, 1]
            col_limit = jnp.minimum(bounds_ref[...], n)
            adj = (
                (dot >= dot_thresh)
                & (col_ids > row_lo)
                & (col_ids < col_limit)
            )
            return jnp.sum(adj.astype(jnp.int32))

        if per_tile:
            n_out = R_TILES * BAND_TILES

            def store(cnt):
                # whole-block one-hot accumulate: Mosaic only allows a
                # sub-(8, 128) output block when it EQUALS the array
                # dims, so each step writes the full [n_out, 128] block
                # with its count in row i * BAND_TILES + j
                onehot = (
                    jax.lax.broadcasted_iota(jnp.int32, (n_out, 1), 0)
                    == i * BAND_TILES + j
                )
                contrib = jnp.where(
                    onehot, cnt, 0
                ) + jnp.zeros((n_out, 128), jnp.int32)

                @pl.when((i == 0) & (j == 0))
                def _init():
                    out_ref[...] = contrib

                @pl.when(jnp.logical_not((i == 0) & (j == 0)))
                def _acc():
                    out_ref[...] = out_ref[...] + contrib
        else:
            def store(cnt):
                @pl.when(j == 0)
                def _init():
                    out_ref[...] = cnt + jnp.zeros((1, 128), jnp.int32)

                @pl.when(j != 0)
                def _acc():
                    out_ref[...] = out_ref[...] + cnt

        if COUNTS_INTERIOR == "1":
            # interior fast path via lax.cond — measured NEGATIVE on v5e
            # (0.46 s vs 0.38 s counts drain at 1M): the per-step cond
            # costs more than the mask VPU passes it skips
            min_bound = scal_ref[3 + R_TILES + i]
            max_row_lo = scal_ref[3 + 2 * R_TILES + i]
            interior = (c0 > max_row_lo) & (c0 + TILE_N <= min_bound)
            store(
                jax.lax.cond(
                    interior,
                    lambda: jnp.sum((dot >= dot_thresh).astype(jnp.int32)),
                    boundary_cnt,
                )
            )
        elif COUNTS_INTERIOR == "2":
            # pl.when variant (predicated regions like the packing
            # kernel's fast path, no scf.if around the reduction)
            min_bound = scal_ref[3 + R_TILES + i]
            max_row_lo = scal_ref[3 + 2 * R_TILES + i]
            interior = (c0 > max_row_lo) & (c0 + TILE_N <= min_bound)

            @pl.when(interior)
            def _i():
                store(jnp.sum((dot >= dot_thresh).astype(jnp.int32)))

            @pl.when(jnp.logical_not(interior))
            def _b():
                store(boundary_cnt())
        else:
            store(boundary_cnt())

    cols_spec = (
        pl.BlockSpec(
            (HASH_BITS_PADDED, TILE_N),
            lambda i, j, s: (0, s[3 + i] + j),
            memory_space=pltpu.VMEM,
        )
        if COLT
        else pl.BlockSpec(
            (TILE_N, HASH_BITS_PADDED),
            lambda i, j, s: (s[3 + i] + j, 0),
            memory_space=pltpu.VMEM,
        )
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(R_TILES, BAND_TILES),
        in_specs=[
            pl.BlockSpec(
                (TILE_M, HASH_BITS_PADDED),
                lambda i, j, s: (s[2] + i, 0),
                memory_space=pltpu.VMEM,
            ),
            cols_spec,
            pl.BlockSpec(
                (TILE_M, 1),
                lambda i, j, s: (s[2] + i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (TILE_M, 1),
                lambda i, j, s: (s[2] + i, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (R_TILES * BAND_TILES, 128),
            lambda i, j, s: (0, 0),
            memory_space=pltpu.VMEM,
        )
        if per_tile
        else pl.BlockSpec(
            (1, 128),
            lambda i, j, s: (i, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    out_rows = R_TILES * BAND_TILES if per_tile else R_TILES

    vmem_mb = int(os.environ.get("VDF_VMEM_LIMIT_MB", "96"))
    compiler_params = (
        None
        if interpret
        else pltpu.CompilerParams(vmem_limit_bytes=vmem_mb * 2**20)
    )

    def one_launch(scalars, rows_pm, cols_pm, bounds, row_lo):
        counts = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((out_rows, 128), jnp.int32),
            compiler_params=compiler_params,
            interpret=interpret,
        )(scalars, rows_pm, cols_pm, bounds, row_lo)
        return counts[:, 0]  # all 128 lanes carry the same value

    return jax.jit(one_launch)


@functools.cache
def _build_sweep_counts(
    interpret: bool,
    sweep_calls: int,
    geom: Geometry = Geometry(),
    per_tile: bool = False,
):
    import jax

    chunk_fn = _build_chunk_counts(interpret, geom, per_tile)

    @jax.jit
    def sweep(scalars_all, rows_pm, cols_pm, bounds, row_lo):
        """int32[sweep_calls, N_SCAL] -> int32[sweep_calls, R_TILES]
        per-row-tile match counts (the whole launch stripe summed), or
        [sweep_calls, R_TILES * BAND_TILES] per-tile counts."""

        def body(_, scal):
            return None, chunk_fn(scal, rows_pm, cols_pm, bounds, row_lo)

        _, counts_all = jax.lax.scan(body, None, scalars_all, unroll=8)
        return counts_all

    return sweep


# phase-B word extraction: capacity of the sized nonzero over one
# phase-B batch's packed adjacency words (each nonzero word holds >= 1
# matching pair; overflow falls back to per-launch host extraction)
EXTRACT_WORD_CAP = int(os.environ.get("VDF_EXTRACT_WORD_CAP", "16384"))
PHASE_B_CALLS = int(os.environ.get("VDF_PHASE_B_CALLS", "64"))
# two-level extraction (VDF_PHASE_B_V2): jnp.nonzero lowers to a full
# sort, and sorting the 16.7M packed words of a 64-launch batch cost
# ~170 ms — phase B was ~56% of the 1M sweep.  V2 first reduces words to
# 1024-word-row nonzero counts (one fused pass), sized-nonzeros the
# (tiny) row list, gathers only the hot rows, and runs the word-level
# sized nonzero over those — two sorts of 16k/1M instead of one of 16.7M.
PHASE_B_V2 = os.environ.get("VDF_PHASE_B_V2", "1") == "1"
PHASE_B_HOT_ROWS = int(os.environ.get("VDF_PHASE_B_HOT_ROWS", "1024"))


@functools.cache
def _build_phase_b(
    interpret: bool, sweep_calls: int, geom: Geometry = Geometry()
):
    """Packing sweep over the (rare) hit launches + fused word extraction.

    One jit: scan the packing kernel over the hit launches, flatten every
    packed adjacency word, sized-nonzero the nonzero WORDS (32x fewer
    elements than bit-expansion — jnp.nonzero lowers to a sort), gather
    their values, and return [loc | val | total] in one small array so a
    phase-B batch costs a single dispatch and a single small fetch.

    With the per-tile driver, ``geom`` is the BAND_TILES=1 repack
    geometry: each "launch" is ONE hit tile, not a 16-tile stripe.
    """
    import jax
    import jax.numpy as jnp

    chunk_fn = _build_chunk(interpret, geom)

    @jax.jit
    def run(scalars_all, rows_pm, cols_pm, bounds, row_lo):
        def body(_, scal):
            packed, _ = chunk_fn(scal, rows_pm, cols_pm, bounds, row_lo)
            return None, packed

        _, packed_all = jax.lax.scan(body, None, scalars_all, unroll=4)
        flat = packed_all.reshape(-1)
        if PHASE_B_V2:
            # two-level: one fused pass reduces words to per-1024-row
            # nonzero counts, a tiny sized-nonzero finds the hot rows,
            # one row gather pulls them, and the word-level sized
            # nonzero runs over HOT_ROWS * 1024 words instead of the
            # whole batch (the full-batch nonzero lowered to a ~170 ms
            # sort of 16.7M words)
            rows = flat.reshape(-1, 1024)
            rownz = jnp.sum((rows != 0).astype(jnp.int32), axis=1)
            hot = jnp.nonzero(
                rownz > 0, size=PHASE_B_HOT_ROWS, fill_value=-1
            )[0].astype(jnp.int32)
            hot_total = jnp.sum((rownz > 0).astype(jnp.int32))
            sub = jnp.take(rows, jnp.maximum(hot, 0), axis=0)
            sub = jnp.where((hot >= 0)[:, None], sub, 0)
            sub_flat = sub.reshape(-1)
            nz = sub_flat != 0
            total = jnp.sum(nz.astype(jnp.int32))
            loc2 = jnp.nonzero(
                nz, size=EXTRACT_WORD_CAP, fill_value=-1
            )[0].astype(jnp.int32)
            val = jnp.take(sub_flat, jnp.maximum(loc2, 0))
            loc = jnp.where(
                loc2 >= 0,
                jnp.take(hot, jnp.maximum(loc2, 0) // 1024) * 1024
                + loc2 % 1024,
                -1,
            ).astype(jnp.int32)
            # hot-row overflow: missed words exist beyond the gathered
            # rows — inflate total past the cap so the decoder takes the
            # exact per-launch fallback
            overflow = (hot_total > PHASE_B_HOT_ROWS).astype(jnp.int32)
            total = total + overflow * (EXTRACT_WORD_CAP + 1)
            return jnp.concatenate([loc, val, total[None]])
        nz = flat != 0
        total = jnp.sum(nz.astype(jnp.int32))
        loc = jnp.nonzero(nz, size=EXTRACT_WORD_CAP, fill_value=-1)[0]
        loc = loc.astype(jnp.int32)
        val = jnp.take(flat, jnp.maximum(loc, 0))
        return jnp.concatenate([loc, val, total[None]])

    return run


def _decode_phase_b(
    arr: np.ndarray,
    sweep_calls: int,
    batch: list[tuple[int, tuple[int, ...]]],
    out_i: list[np.ndarray],
    out_j: list[np.ndarray],
    geom: Geometry = Geometry(),
) -> bool:
    """Host decode of one phase-B result ([loc | val | total]): word
    locations + values -> global (row, col) pairs appended to out_i/out_j.
    Returns False on word-capacity overflow (caller falls back)."""
    TILE_M, TILE_N, R_TILES, BAND_TILES = geom
    cap = EXTRACT_WORD_CAP
    loc = arr[:cap]
    val = arr[cap : 2 * cap].astype(np.int64) & 0xFFFFFFFF
    total = int(arr[-1])
    valid = loc >= 0
    if total > int(valid.sum()):
        return False
    loc = loc[valid].astype(np.int64)
    val = val[valid]
    if loc.size == 0:
        return True
    # packed_all layout: [launch, R_TILES, BAND_TILES, TILE_M//32, TILE_N];
    # bit b of word [k, i, j, r, c] = pair (row r*32+b, col c) of tile
    # (i, j) of launch k
    shape = (sweep_calls, R_TILES, BAND_TILES, TILE_M // 32, TILE_N)
    k, i, j, r, c = np.unravel_index(loc, shape)
    keep = k < len(batch)  # drop padding launches
    k, i, j, r, c, val = (
        k[keep], i[keep], j[keep], r[keep], c[keep], val[keep]
    )
    if k.size == 0:
        return True
    rt0s = np.array([b[0] for b in batch], dtype=np.int64)
    cts = np.array([b[1] for b in batch], dtype=np.int64)
    rbase = (rt0s[k] + i) * TILE_M + r * 32
    cbase = (cts[k, i] + j) * TILE_N + c
    bits = (val[:, None] >> np.arange(32, dtype=np.int64)[None, :]) & 1
    ww, bb = np.nonzero(bits)
    out_i.append(rbase[ww] + bb)
    out_j.append(cbase[ww])
    return True


def _plan_launches(state) -> list[tuple[int, tuple[int, ...]]]:
    """Enumerate every launch descriptor (first row tile, per-row-tile
    first column tile), covering each row tile's whole duration band in
    BAND_TILES stripes."""
    TILE_M, TILE_N, R_TILES, BAND_TILES = state.geom
    launches: list[tuple[int, tuple[int, ...]]] = []
    max_ct = state.max_ct
    clamp = int(max_ct - BAND_TILES)
    if R_TILES == 1:
        # fast path: plain-int loop (2.8M launches at 16M hashes — the
        # per-stripe NumPy ops of the general path cost ~10x more)
        first_ct = state.first_ct
        n_ct = state.n_ct
        for rt in range(state.n_row_chunks):
            nc = int(n_ct[rt])
            if nc <= 0:
                continue
            ct0 = int(first_ct[rt])
            launches.extend(
                (rt, (min(ct0 + s, clamp),))
                for s in range(0, nc, BAND_TILES)
            )
        return launches
    for chunk_idx in range(state.n_row_chunks):
        rt0 = chunk_idx * R_TILES
        rts = np.arange(rt0, rt0 + R_TILES)
        remaining = state.n_ct[rts].copy()
        starts = state.first_ct[rts].copy()
        while np.any(remaining > 0):
            # rows whose band is exhausted keep pointing past their band
            # end (clamped in-bounds): the col_ids < bounds mask empties
            # them.
            cur = np.minimum(starts, clamp).astype(np.int64)
            launches.append((rt0, tuple(int(c) for c in cur)))
            starts = starts + BAND_TILES
            remaining = remaining - BAND_TILES
    return launches


def _gen_batches(state, launches, sweep_sizes):
    """Yield (launch batch, window start row | None).

    Resident states batch by count alone (largest precompiled size that
    the remainder fills — padded launches run their full DMA+MXU work for
    nothing).  Windowed states additionally cut a batch when its
    row+band span would leave the resident +/-1 window."""
    TILE_M, TILE_N, R_TILES, BAND_TILES = state.geom
    if not getattr(state, "windowed", False):
        b0 = 0
        while b0 < len(launches):
            rem = len(launches) - b0
            size = next(
                (s for s in sweep_sizes if s <= rem), sweep_sizes[-1]
            )
            yield launches[b0 : b0 + size], None
            b0 += min(size, rem)
    elif getattr(state, "split", False):
        # split-window states: a batch must fit BOTH windows — the row
        # chunk inside the (statically positioned) rows window, the
        # launch's column stripe inside the (dynamically anchored) cols
        # window.  The caller sorted launches by (rows window, column),
        # so both windows advance monotonically within their loops.
        rw = state.rows_window_rows
        cw = state.window_rows
        align = state.window_align
        total = int(state.packed_dev.shape[0])
        rmax = total - rw
        wmax = total - cw
        max_batch = sweep_sizes[0]
        i = 0
        cur: tuple[int, int] | None = None
        while i < len(launches):
            batch: list[tuple[int, tuple[int, ...]]] = []
            for _attempt in range(2):
                while i < len(launches) and len(batch) < max_batch:
                    rt0, cts = launches[i]
                    r_start = min(rt0 * TILE_M // rw * rw, rmax)
                    lo_edge = min(cts) * TILE_N
                    end = (max(cts) + BAND_TILES) * TILE_N
                    if (
                        cur is None
                        or r_start != cur[0]
                        or lo_edge < cur[1]
                        or end - cur[1] > cw
                    ):
                        break
                    batch.append(launches[i])
                    i += 1
                if batch or i >= len(launches):
                    break
                rt0, cts0 = launches[i]
                cur = (
                    min(rt0 * TILE_M // rw * rw, rmax),
                    min(min(cts0) * TILE_N // align * align, wmax),
                )
            assert batch, "single launch exceeds the split window spans"
            yield batch, cur
    else:
        w_rows = state.window_rows
        align = state.window_align
        wmax = int(state.packed_dev.shape[0]) - w_rows
        max_batch = sweep_sizes[0]
        rows_static = getattr(state, "rows_static", False)
        i = 0
        w_start: int | None = None
        while i < len(launches):
            batch: list[tuple[int, tuple[int, ...]]] = []
            for _attempt in range(2):
                while i < len(launches) and len(batch) < max_batch:
                    rt0, cts = launches[i]
                    if rows_static:
                        # rows are resident (refs): only the launch's
                        # COLUMN stripe must lie inside the window
                        lo_edge = min(cts) * TILE_N
                        end = (max(cts) + BAND_TILES) * TILE_N
                    else:
                        lo_edge = rt0 * TILE_M
                        end = max(
                            (rt0 + R_TILES) * TILE_M,
                            (max(cts) + BAND_TILES) * TILE_N,
                        )
                    if (
                        w_start is None
                        or lo_edge < w_start
                        or end - w_start > w_rows
                    ):
                        break
                    batch.append(launches[i])
                    i += 1
                if batch or i >= len(launches):
                    break
                # current window exhausted: reposition it at this
                # launch's chunk (the window is REUSED across batches
                # until then — repositioning per batch would force a
                # drain + rebuild every few thousand rows)
                rt0, cts0 = launches[i]
                anchor = (
                    min(cts0) * TILE_N if rows_static else rt0 * TILE_M
                )
                w_start = min((anchor // align) * align, wmax)
            assert batch, "single launch exceeds the window span"
            yield batch, w_start


def _fill_scalars(
    scalars_all: np.ndarray,
    batch: list[tuple[int, tuple[int, ...]]],
    state,
    tolerance_int: int,
    n: int,
    w_start: int | None,
) -> None:
    """Launch scalars for one batch; padding rows keep tol=-1 (impossible
    threshold -> no matches)."""
    TILE_M, TILE_N, R_TILES, _BAND_TILES = state.geom
    # rows_static states (windowed refs search) keep the whole rows
    # operand resident — only the COLUMN window slides, so row-tile
    # indices are absolute while column tiles are window-relative
    rows_static = getattr(state, "rows_static", False)
    if isinstance(w_start, tuple):
        # split-window state: independent rows/cols window bases
        w_tm = w_start[0] // TILE_M
        w_tn = w_start[1] // TILE_N
    else:
        w_tm = 0 if (w_start is None or rows_static) else w_start // TILE_M
        w_tn = 0 if w_start is None else w_start // TILE_N
    scalars_all[:, 0] = -1
    k = len(batch)
    rt0s = np.fromiter((b[0] for b in batch), np.int64, count=k)
    cts = np.array([b[1] for b in batch], dtype=np.int64).reshape(
        k, R_TILES
    )
    scalars_all[:k, 0] = tolerance_int
    scalars_all[:k, 1] = n
    scalars_all[:k, 2] = rt0s - w_tm
    scalars_all[:k, 3 : 3 + R_TILES] = cts - w_tn
    idx = rt0s[:, None] + np.arange(R_TILES)
    scalars_all[:k, 3 + R_TILES : 3 + 2 * R_TILES] = state.min_bound[idx]
    scalars_all[:k, 3 + 2 * R_TILES : 3 + 3 * R_TILES] = (
        state.max_row_lo[idx]
    )
    scalars_all[:k, 3 + 3 * R_TILES] = w_tn
    # row-window base: >= 0 selects the in-kernel iota row_lo (global
    # row index, the self-search); -1 reads the row_lo operand (refs)
    scalars_all[:k, 4 + 3 * R_TILES] = (
        w_tm if getattr(state, "row_lo_iota", True) else -1
    )


@functools.cache
def _pack_matrices(TILE_M: int) -> tuple[np.ndarray, np.ndarray]:
    """[TILE_M//32, TILE_M] f32 transposed-bitpack operators: word r of a
    column collects rows r*32..r*32+31, split into exact 16-bit halves."""
    k = np.arange(TILE_M)
    r = np.arange(TILE_M // 32)[:, None]
    in_word = (k[None, :] // 32) == r
    bitpos = k[None, :] % 32
    lo = np.where(in_word & (bitpos < 16), 2.0 ** bitpos, 0.0)
    hi = np.where(in_word & (bitpos >= 16), 2.0 ** (bitpos - 16), 0.0)
    return lo.astype(np.float32), hi.astype(np.float32)


@functools.cache
def _unpack_jit():
    import jax
    import jax.numpy as jnp

    @jax.jit
    def f(p):
        k = p.shape[0]
        shifts = jnp.arange(32, dtype=jnp.uint32)[None, None, :]
        bits = (p[:, :, None] >> shifts) & jnp.uint32(1)
        pm = bits.astype(jnp.int8).reshape(k, HASH_BITS_PADDED) * 2 - 1
        return pm if PM_DTYPE == "int8" else pm.astype(jnp.bfloat16)

    return f


def unpack_pm1_device(packed):
    """uint32[K, 32] -> PM_DTYPE[K, 1024] over {-1, +1} (jitted ONCE —
    rebuilding the jit per call retraced and re-deserialized the
    persistent-cache entry every time, ~2 s at the 1M shape)."""
    return _unpack_jit()(packed)


@functools.cache
def _transpose_jit():
    """[n, 1024] -> [1024, n] device transpose (the VDF_COLT column
    operand: one relayout up front instead of one per grid step)."""
    import jax

    @jax.jit
    def f(pm):
        return pm.T

    return f


def _tile_bits_to_pairs(words: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """int32[TILE_M//32, TILE_N] transposed words -> (row_off, col_off)."""
    u = np.ascontiguousarray(words).view(np.uint32)
    # bit b of u[r, c] = adjacency of (row r*32+b, col c)
    bits = (
        (u[:, None, :] >> np.arange(32, dtype=np.uint32)[None, :, None]) & 1
    ).astype(bool)  # [TILE_M//32, 32, TILE_N]
    rr, bb, cc = np.nonzero(bits)
    return rr * 32 + bb, cc


def _launch_metadata(
    n: int, bounds: np.ndarray, n_row_chunks: int, geom: Geometry
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Per row tile: first col tile of the band, number of col tiles, and
    the window extrema driving the kernel's interior-tile fast path."""
    TILE_M, TILE_N, R_TILES, _BAND_TILES = geom
    n_tiles = n_row_chunks * R_TILES
    first_ct = np.zeros(n_tiles, dtype=np.int64)
    n_ct = np.zeros(n_tiles, dtype=np.int64)
    min_bound = np.zeros(n_tiles, dtype=np.int64)
    max_row_lo = np.full(n_tiles, _ROW_LO_SENTINEL, dtype=np.int64)
    # vectorized per-tile reduction (a Python loop here is 16k iterations
    # at 16M hashes, paid on every cold state build): full tiles reduce
    # in one reshape, the partial tail tile separately; tiles past n keep
    # the (0, 0, 0, sentinel) defaults
    bounds_c = np.asarray(bounds[:n], dtype=np.int64)
    nt_used = min(-(-n // TILE_M), n_tiles) if n else 0
    if nt_used:
        nt_full = min(n // TILE_M, n_tiles)
        cmax = np.empty(nt_used, np.int64)
        cmin = np.empty(nt_used, np.int64)
        if nt_full:
            resh = bounds_c[: nt_full * TILE_M].reshape(-1, TILE_M)
            cmax[:nt_full] = resh.max(axis=1)
            cmin[:nt_full] = resh.min(axis=1)
            # full tiles: no pad-row sentinels
            max_row_lo[:nt_full] = (
                np.arange(1, nt_full + 1, dtype=np.int64) * TILE_M - 1
            )
        if nt_used > nt_full:  # partial tail tile
            cmax[nt_full] = bounds_c[nt_full * TILE_M :].max()
            cmin[nt_full] = bounds_c[nt_full * TILE_M :].min()
        r0 = np.arange(nt_used, dtype=np.int64) * TILE_M
        ct0 = (r0 + 1) // TILE_N
        first_ct[:nt_used] = ct0
        n_ct[:nt_used] = np.maximum(
            0, -(-(cmax - ct0 * TILE_N) // TILE_N)
        )
        min_bound[:nt_used] = np.minimum(cmin, n)
    return first_ct, n_ct, min_bound, max_row_lo


class PallasSearchState:
    """Device-resident search state, reusable across sweeps.

    Separates the one-time cost (h2d upload of the packed matrix + on-device
    unpack to +/-1 bf16) from the per-search sweep: in the full pipeline the
    hash matrix is born on device, and repeated searches (e.g. tolerance
    sweeps) shouldn't re-upload 128 B/hash each time.

    ``pm1_dev`` (uint32[n_pad, 32] already on device, duration-sorted) can
    replace the host ``packed`` — the incremental-library path, where only
    new rows ride h2d and the sort is a device gather.
    """

    row_lo_iota = True  # self-search: in-kernel iota row_lo

    def __init__(
        self,
        packed: np.ndarray | None,
        bounds: np.ndarray,
        n: int | None = None,
        packed_dev=None,
        defer_upload: bool = False,
        geom: Geometry | None = None,
    ) -> None:
        import jax.numpy as jnp

        self.geom = geom = geom if geom is not None else Geometry()
        TILE_M, TILE_N, R_TILES, BAND_TILES = geom
        if n is None:
            assert packed is not None
            n = packed.shape[0]
        bounds = np.asarray(bounds, dtype=np.int64)
        n_row_tiles = -(-n // TILE_M)
        n_row_chunks = -(-n_row_tiles // R_TILES)
        n_pad = n_row_chunks * R_TILES * TILE_M + (BAND_TILES + 1) * TILE_N
        self.uploaded_rows: int | None = None
        if packed_dev is not None:
            assert packed_dev.shape[0] >= n_pad
            self.pm1 = unpack_pm1_device(packed_dev[:n_pad])
        elif defer_upload:
            # streamed build: the h2d is the cold-search wall (~26 MB/s
            # sustained through this tunnel = ~5 s at 1M hashes), but the
            # duration band is near-diagonal, so the sweep can start as
            # soon as each row prefix is resident — ensure_rows() uploads
            # chunk-by-chunk and the sweep driver interleaves.
            stream_rows = int(
                os.environ.get("VDF_STREAM_CHUNK_ROWS", "131072")
            )
            stream_rows = min(stream_rows, -(-n_pad // 256) * 256)
            n_chunks = -(-n_pad // stream_rows)
            total = n_chunks * stream_rows
            self._host_pad = np.zeros((total, packed.shape[1]), np.uint32)
            self._host_pad[:n] = packed
            self._stream_rows = stream_rows
            pm_dt = jnp.int8 if PM_DTYPE == "int8" else jnp.bfloat16
            self.pm1 = jnp.zeros((total, HASH_BITS_PADDED), pm_dt)
            self.uploaded_rows = 0
        else:
            packed_pad = np.zeros((n_pad, packed.shape[1]), dtype=np.uint32)
            packed_pad[:n] = packed
            self.pm1 = unpack_pm1_device(jnp.asarray(packed_pad))
        self.pm1T = None
        if COLT:
            assert not defer_upload, "VDF_COLT: streamed states unsupported"
            self.pm1T = _transpose_jit()(self.pm1)
        if not defer_upload:
            self.pm1.block_until_ready()

        bounds_dev_np = np.full((n_pad, 1), -1, dtype=np.int32)
        bounds_dev_np[:n, 0] = np.minimum(bounds, n)
        self.bounds_dev = jnp.asarray(bounds_dev_np)

        # self-search row_lo (j > i) is computed in-kernel from an iota
        # (row_lo_iota); the operand slot aliases bounds — a real
        # [n_pad, 1] int32 array costs 512 B/row of lane padding
        # (~0.5 GB per 1M hashes)
        self.row_lo_dev = self.bounds_dev

        # per row tile: first col tile of the band, number of col tiles,
        # and the window extrema (the kernel's interior-tile fast path)
        first_ct, n_ct, min_bound, max_row_lo = _launch_metadata(
            n, bounds, n_row_chunks, geom
        )
        self.n = n
        self.n_pad = n_pad
        self.n_row_chunks = n_row_chunks
        self.first_ct = first_ct
        self.n_ct = n_ct
        self.min_bound = min_bound
        self.max_row_lo = max_row_lo
        self.max_ct = (n_pad - TILE_N) // TILE_N

    def ensure_rows(self, rows_needed: int) -> None:
        """Streamed build: upload chunks until ``rows_needed`` rows of the
        +/-1 matrix are resident (no-op for eagerly built states).

        Uploads run inline on the driver thread: a background uploader
        thread measured WORSE on this 1-core host (GIL contention with
        sweep dispatch).  Cold-search wall time is dominated by the dev
        tunnel's h2d (load-dependent, ~26 MB/s sustained: 9-14 s for a
        132 MB library); production PCIe moves this back to sweep-bound."""
        if self.uploaded_rows is None:
            return
        import jax.numpy as jnp

        total = self._host_pad.shape[0]
        rows_needed = min(rows_needed, total)
        update = _stream_update_jit()
        while self.uploaded_rows < rows_needed:
            a = self.uploaded_rows
            b = a + self._stream_rows
            chunk = jnp.asarray(self._host_pad[a:b])
            self.pm1 = update(self.pm1, chunk, jnp.int32(a))
            self.uploaded_rows = b


@functools.cache
def _stream_update_jit():
    import jax

    # no donation: in-flight sweep batches still read the previous pm1
    # buffer, and donating it would invalidate their handle — the
    # full-buffer copy costs ~2.5 ms per chunk at HBM bandwidth
    @jax.jit
    def f(pm1, chunk_packed, at):
        # whole-chunk unpack (one scan step): the operand arrives by h2d,
        # not via a dynamic_slice, so no broadcast temp materializes
        pm = unpack_pm_scan(chunk_packed, chunk_packed.shape[0])
        return jax.lax.dynamic_update_slice(pm1, pm, (at, 0))

    return f


@functools.cache
def _incremental_jits():
    import jax
    import jax.numpy as jnp

    @functools.partial(jax.jit, donate_argnums=(0,))
    def update_rows(buf, rows, at):
        # donated: appends write in place, no 128 B/hash re-copy
        return jax.lax.dynamic_update_slice(buf, rows, (at, 0))

    @jax.jit
    def gather_rows(buf, idx):
        return jnp.take(buf, idx, axis=0, mode="clip")

    return update_rows, gather_rows


class IncrementalDeviceLibrary:
    """Append-only device-resident packed-hash store.

    Rows live on device in INSERTION order; ``append`` uploads only the
    new rows (128 B/hash h2d, into a donated buffer).  ``state`` then
    materializes a duration-sorted ``PallasSearchState`` via a device
    gather — the cache-update-then-search flow no longer re-uploads the
    whole matrix per update (round-1 ROADMAP item).  Rows gathered past
    ``n`` (tile padding) may be garbage: every kernel masks pad rows and
    columns by id/bounds, so their distances never become pairs.
    """

    def __init__(self, capacity: int = 4096) -> None:
        import jax.numpy as jnp

        self._cap = max(1024, int(capacity))
        if self._cap * 128 > _max_alloc_bytes():
            # past the single-allocation watermark: chunked store
            store = ChunkedPackedStore.zeros(self._cap)
            self._cap = store.shape[0]
            self._packed = store
        else:
            self._packed = jnp.zeros((self._cap, 32), jnp.uint32)
        self.n = 0
        self._shared = False  # a state holds a zero-copy view of _packed

    def _grow(self, need: int) -> None:
        import jax.numpy as jnp

        if isinstance(self._packed, ChunkedPackedStore):
            # chunk granularity already amortizes growth; existing
            # chunks are reused untouched (shallow-copy the list if a
            # state shares it so its view keeps the old length)
            store = self._packed
            if self._shared:
                store = ChunkedPackedStore(
                    list(store.chunks), store.chunk_rows
                )
            store.extend_to(need)
            self._packed = store
            self._cap = store.shape[0]
            self._shared = False
            return
        new_cap = self._cap
        while new_cap < need:
            new_cap *= 2
        if new_cap * 128 > _max_alloc_bytes() / 2:
            # crossing HALF the single-allocation watermark: migrate to
            # a chunked store NOW, while the flat source plus its
            # chunk-sized copies still fit beside each other.  Waiting
            # for the full watermark (as the first round-5 cut did)
            # migrates from an up-to-8 GiB flat buffer whose source +
            # destination + copy temps exceed the 16 GB device — the
            # exact bare OOM this class exists to prevent.
            self._migrate_to_chunked(need)
            return
        buf = jnp.zeros((new_cap, 32), jnp.uint32)
        update_rows, _ = _incremental_jits()
        self._packed = update_rows(
            buf, self._packed[: self.n], jnp.int32(0)
        )
        self._cap = new_cap
        self._shared = False

    def _migrate_to_chunked(self, need: int) -> None:
        """Migrate the flat packed buffer into a ``ChunkedPackedStore``
        with bounded peak HBM.

        Chunks are built as chunk-sized device slices of the flat
        buffer (never a full-size copy, never a pre-zeroed full store),
        so the d2d path peaks at ~2x the flat bytes + one chunk.  A flat
        buffer already past half the watermark (only reachable via an
        explicit large ctor ``capacity``) bounces through the host
        instead — d2h chunk fetches, drop the flat buffer, re-upload —
        peaking at flat + one chunk on device; slower, but the d2d
        route would need ~2x flat + scratch, past total HBM.
        """
        import jax.numpy as jnp

        check_packed_capacity(need, "chunked packed store")
        cr = fit_chunk_rows(max(need, int(self._packed.shape[0])))
        flat = self._packed
        rows_total = int(flat.shape[0])
        flat_bytes = rows_total * 128
        chunks = []
        if flat_bytes <= _max_alloc_bytes() / 2:
            at = 0
            while at < rows_total:
                take = min(cr, rows_total - at)
                chunks.append(
                    _chunk_slice1_jit(take)(flat, jnp.int32(at))
                )
                at += take
        else:
            import logging

            logging.getLogger(__name__).warning(
                "migrating a %.1f GiB flat device library through the"
                " host (chunked growth past the single-allocation"
                " watermark): expect one-off d2h+h2d transfer time",
                flat_bytes / 2**30,
            )
            host_pieces = []
            at = 0
            while at < rows_total:
                take = min(cr, rows_total - at)
                host_pieces.append(
                    np.asarray(
                        _chunk_slice1_jit(take)(flat, jnp.int32(at))
                    )
                )
                at += take
            # drop every device reference to the flat buffer before
            # re-uploading, so flat + chunks never coexist
            self._packed = flat = None
            chunks = [jnp.asarray(p) for p in host_pieces]
        store = ChunkedPackedStore(chunks, cr)
        flat = None  # last flat reference (d2d path) dies here
        self._packed = store  # data safe before the zero-extension
        store.extend_to(need)  # capacity pre-checked above
        self._cap = store.shape[0]
        self._shared = False

    def append(self, packed_rows: np.ndarray) -> None:
        import jax.numpy as jnp

        packed_rows = np.ascontiguousarray(packed_rows, dtype=np.uint32)
        k = packed_rows.shape[0]
        if k == 0:
            return
        if self.n + k > self._cap:
            self._grow(self.n + k)
        elif self._shared:
            # a zero-copy state references _packed: the donating in-place
            # append below would delete the buffer under it — copy first
            if isinstance(self._packed, ChunkedPackedStore):
                # chunks are immutable jnp arrays; a shallow list copy
                # suffices (set_rows rebinds entries in OUR list only)
                self._packed = ChunkedPackedStore(
                    list(self._packed.chunks), self._packed.chunk_rows
                )
            else:
                self._packed = jnp.array(self._packed)
            self._shared = False
        if isinstance(self._packed, ChunkedPackedStore):
            self._packed.set_rows(self.n, packed_rows)
        else:
            update_rows, _ = _incremental_jits()
            self._packed = update_rows(
                self._packed, jnp.asarray(packed_rows), jnp.int32(self.n)
            )
        self.n += k

    def state(
        self,
        order: np.ndarray,
        bounds: np.ndarray,
        windowed: bool | None = None,
        geom: Geometry | None = None,
        split: bool | None = None,
    ) -> "PallasSearchState | WindowedPallasState | SplitWindowState":
        """Duration-sorted search state for the current library.

        ``order``: permutation (insertion index per sorted position, the
        host's (duration, path) sort); ``bounds``: per sorted row, the
        exclusive upper bound of its duration window.  ``windowed``
        defaults to the VDF_WINDOWED_THRESHOLD auto rule (sliding +/-1
        window above ~3M rows instead of the 1 KB/hash resident matrix);
        ``split`` defaults to ``should_split`` (independent rows/cols
        windows once packed + the minimum single window exceed HBM).

        An IDENTITY ``order`` (rows appended pre-sorted) with enough
        capacity hands the library buffer to the state zero-copy — at
        64M hashes the gather alone would transiently hold two 8.2 GB
        buffers.  The next ``append`` copies before its donating
        in-place update so the state's view stays valid.
        """
        import jax.numpy as jnp

        geom = geom if geom is not None else Geometry()
        TILE_M, TILE_N, R_TILES, BAND_TILES = geom
        n = int(len(order))
        assert n <= self.n
        if windowed is None:
            windowed = n >= int(
                os.environ.get("VDF_WINDOWED_THRESHOLD", "3000000")
            )
        if split is None:
            split = windowed and should_split(n, bounds, geom)
        # size to the STATE's real packed need (window slide-room
        # included), so the zero-copy check and the gather output never
        # force the constructor's pad concatenate — at 64M that concat
        # transiently doubles an 8.2 GB buffer past HBM
        if split:
            n_pad = split_need(n, bounds, geom=geom)
        elif windowed:
            n_pad = windowed_need(n, bounds, geom=geom)
        else:
            n_row_tiles = -(-n // TILE_M)
            n_row_chunks = -(-n_row_tiles // R_TILES)
            n_pad = (
                n_row_chunks * R_TILES * TILE_M
                + (BAND_TILES + 1) * TILE_N
            )
        order_np = np.asarray(order, dtype=np.int64)
        chunked = isinstance(self._packed, ChunkedPackedStore)
        if (
            n == self.n
            # a chunked store extends itself with zero chunks inside the
            # state constructor, so its capacity never forces a gather
            and (self._cap >= n_pad or chunked)
            and np.array_equal(order_np, np.arange(n, dtype=np.int64))
        ):
            if chunked and not (windowed or split):
                raise ValueError(
                    f"library of {n} hashes is chunked past the "
                    f"single-allocation watermark "
                    f"({_max_alloc_bytes() / 2**30:.1f} GiB, "
                    f"VDF_MAX_ALLOC_GB) and requires a windowed state; "
                    f"do not force windowed=False at this scale"
                )
            if chunked:
                # hand the state its OWN store wrapper (shallow list
                # copy; the chunk arrays themselves are shared): the
                # state ctor extend_to()s window slide room, which must
                # not mutate the library's store in place or stale its
                # _cap.  Library appends rebind entries of the library's
                # own list (non-donating updates), so the state's copy
                # stays valid without the _shared dance.
                packed_sorted = ChunkedPackedStore(
                    list(self._packed.chunks), self._packed.chunk_rows
                )
            else:
                packed_sorted = self._packed  # zero-copy; pads masked
                self._shared = True
        elif chunked:
            # a cross-chunk permutation gather would transiently hold
            # source + destination stores (2 x 128 B/hash) plus gather
            # temps — past total HBM at every size that chunks.  The
            # zero-copy handoff above is the supported path here.
            raise ValueError(
                f"library of {self.n} hashes exceeds the single-"
                f"allocation watermark ({_max_alloc_bytes() / 2**30:.1f}"
                f" GiB, VDF_MAX_ALLOC_GB): append rows duration-sorted "
                f"(identity order over the full library) — an unsorted "
                f"handoff needs a permutation gather that cannot fit "
                f"HBM at this scale"
            )
        else:
            idx = np.zeros(n_pad, np.int32)
            idx[:n] = order_np
            _, gather_rows = _incremental_jits()
            packed_sorted = gather_rows(self._packed, jnp.asarray(idx))
        cls = (
            SplitWindowState
            if split
            else (WindowedPallasState if windowed else PallasSearchState)
        )
        return cls(None, bounds, n=n, packed_dev=packed_sorted, geom=geom)


@functools.cache
def _packed_update_jit():
    import jax
    import jax.numpy as jnp

    # no donation: queued window builds may still read the buffer; the
    # full-buffer copy costs ~10 ms at the 16M shape (HBM bandwidth)
    @jax.jit
    def f(buf, chunk, at):
        return jax.lax.dynamic_update_slice(buf, chunk, (at, 0))

    return f


def _max_alloc_bytes() -> float:
    """Largest single device buffer the backend will grant.  Measured by
    ballast bisection (tools/probe_hbm.py): 8.0 GiB allocates, 8.25 GiB
    is RESOURCE_EXHAUSTED on this 16 GB v5e — a single [n, 32] uint32
    packed matrix therefore caps at ~67M hashes even though HBM holds
    more.  ``VDF_MAX_ALLOC_GB`` overrides."""
    return float(os.environ.get("VDF_MAX_ALLOC_GB", "8")) * 2**30


def _packed_cap_bytes() -> float:
    """Total packed-library bytes the device can hold with working room
    for the sweep's window operands and compiled-program scratch.
    Measured on the 16 GB v5e (BENCH_SCALE_r05.json): 80M hashes
    (1.02e10 B packed) sweeps at full rate; 96M (1.23e10 B) is
    RESOURCE_EXHAUSTED even at minimum split windows, and 100M fails
    during library construction.  ``VDF_PACKED_CAP_GB`` overrides for
    devices with more HBM."""
    return float(os.environ.get("VDF_PACKED_CAP_GB", "11")) * 1e9


def check_packed_capacity(total_rows: int, who: str = "packed library") -> None:
    """Raise a clear capacity error instead of letting a multi-GB
    allocation die deep inside the runtime with a bare
    RESOURCE_EXHAUSTED (round-5 VERDICT item 4: graceful past-the-edge
    behavior)."""
    need = int(total_rows) * 128
    cap = _packed_cap_bytes()
    if need > cap:
        raise ValueError(
            f"{who} of {int(total_rows):,} hashes needs {need / 1e9:.2f} GB"
            f" packed, over the {cap / 1e9:.1f} GB device capacity budget"
            f" (measured ceiling on a 16 GB v5e: 80M hashes pass, 96M is"
            f" RESOURCE_EXHAUSTED — BENCH_SCALE_r05.json).  Shard the"
            f" library across chips (backend='ring') or raise"
            f" VDF_PACKED_CAP_GB on a larger device."
        )


def _default_chunk_rows() -> int:
    """Rows per chunk of a ``ChunkedPackedStore`` (default 16M rows =
    2 GiB).  Must be a multiple of the window alignment (lcm of the tile
    dims, 2048 at the production geometry) and at least as large as any
    sliding window so a window spans <= 2 adjacent chunks."""
    return int(os.environ.get("VDF_CHUNK_ROWS", str(16 * 2**20)))


@functools.cache
def _chunk_slice1_jit(w_rows: int):
    import jax

    @jax.jit
    def f(c, rel):
        return jax.lax.dynamic_slice(c, (rel, 0), (w_rows, 32))

    return f


@functools.cache
def _chunk_slice_k_jit(w_rows: int, chunk_rows: int, k: int):
    import jax
    import jax.numpy as jnp

    # window straddling k chunks: k bounded row gathers + selects (a
    # concatenate of the chunks would transiently hold k x chunk_bytes;
    # a clamped dynamic_slice would silently shift out-of-range starts).
    # ``rel`` is traced so every move at this window size reuses one
    # compile (each kernel compile costs ~7.5 s through the remote
    # helper on this tunnel).
    @jax.jit
    def f(rel, *cs):
        idx = rel + jnp.arange(w_rows, dtype=jnp.int32)
        out = None
        for ci, c in enumerate(cs):
            local = idx - ci * chunk_rows
            g = jnp.take(
                c, jnp.clip(local, 0, chunk_rows - 1), axis=0
            )
            if out is None:
                out = g
            else:
                out = jnp.where((local >= 0)[:, None], g, out)
        return out

    return f


class ChunkedPackedStore:
    """Packed [n, 32] uint32 library split across fixed-size device
    chunks.

    One flat buffer hits the measured single-allocation watermark
    (``_max_alloc_bytes``, ~8 GiB on this v5e) at ~67M hashes; splitting
    the store bounds every allocation at ``chunk_rows`` x 128 B while
    keeping the library fully device-resident.  Sliding windows
    (<= ~2M rows) slice across at most two adjacent chunks, so window
    rebuild cost is unchanged on the (common) single-chunk path and one
    bounded gather on the straddle path.  Capacity then scales to total
    HBM instead of the per-allocation cap — the layout behind the >64M
    points (reference scaling claim being exceeded:
    vid_dup_finder_lib/src/lib.rs:120-127).
    """

    ndim = 2

    def __init__(self, chunks: list, chunk_rows: int) -> None:
        self.chunk_rows = int(chunk_rows)
        self.chunks = list(chunks)
        # routing invariant: every chunk is exactly chunk_rows, except
        # the LAST, which may be shorter (trims up to chunk_bytes of
        # rounding waste — decisive at the total-HBM capacity edge)
        assert all(
            int(c.shape[0]) == self.chunk_rows for c in chunks[:-1]
        )
        assert int(chunks[-1].shape[0]) <= self.chunk_rows

    @classmethod
    def zeros(cls, total_rows: int, chunk_rows: int | None = None):
        import jax.numpy as jnp

        check_packed_capacity(total_rows, "chunked packed store")
        cr = int(chunk_rows or _default_chunk_rows())
        total = max(256, -(-int(total_rows) // 256) * 256)
        full, rem = divmod(total, cr)
        chunks = [jnp.zeros((cr, 32), jnp.uint32) for _ in range(full)]
        if rem or not chunks:
            chunks.append(jnp.zeros((max(rem, 256), 32), jnp.uint32))
        return cls(chunks, cr)

    @property
    def shape(self) -> tuple[int, int]:
        return (
            self.chunk_rows * (len(self.chunks) - 1)
            + int(self.chunks[-1].shape[0]),
            32,
        )

    @property
    def nbytes(self) -> int:
        return self.shape[0] * 128

    def block_until_ready(self) -> None:
        for c in self.chunks:
            c.block_until_ready()

    def extend_to(self, total_rows: int) -> None:
        """Grow the store to hold ``total_rows`` (zero rows appended).
        A short last chunk is padded back to full first so the uniform
        chunk routing stays valid."""
        import jax.numpy as jnp

        if self.shape[0] >= total_rows:
            return
        check_packed_capacity(total_rows, "chunked packed store")
        last = self.chunks[-1]
        if int(last.shape[0]) < self.chunk_rows:
            pad = jnp.zeros(
                (self.chunk_rows - int(last.shape[0]), 32), jnp.uint32
            )
            self.chunks[-1] = jnp.concatenate([last, pad], axis=0)
        while self.shape[0] < total_rows:
            short = total_rows - self.shape[0]
            if short < self.chunk_rows:
                self.chunks.append(
                    jnp.zeros(
                        (-(-short // 256) * 256, 32), jnp.uint32
                    )
                )
            else:
                self.chunks.append(
                    jnp.zeros((self.chunk_rows, 32), jnp.uint32)
                )

    def slice_rows(self, at: int, w_rows: int):
        """Device uint32[w_rows, 32] window starting at row ``at``.
        ``at`` is a host int (window moves are host-level events), so
        chunk routing is static; only the intra-chunk offset is traced."""
        import jax.numpy as jnp

        assert 0 <= at and at + w_rows <= self.shape[0]
        c = at // self.chunk_rows
        rel = at - c * self.chunk_rows
        if rel + w_rows <= self.chunk_rows:
            return _chunk_slice1_jit(w_rows)(
                self.chunks[c], jnp.int32(rel)
            )
        k = -(-(rel + w_rows) // self.chunk_rows)
        return _chunk_slice_k_jit(w_rows, self.chunk_rows, k)(
            jnp.int32(rel), *self.chunks[c : c + k]
        )

    def set_rows(self, at: int, rows) -> None:
        """Write ``rows`` (host or device uint32[k, 32]) at row ``at``,
        splitting across chunk boundaries as needed."""
        import jax.numpy as jnp

        rows = np.ascontiguousarray(rows, dtype=np.uint32) if isinstance(
            rows, np.ndarray
        ) else rows
        k = int(rows.shape[0])
        assert at + k <= self.shape[0]
        upd = _packed_update_jit()
        off = 0
        while off < k:
            c = (at + off) // self.chunk_rows
            rel = (at + off) - c * self.chunk_rows
            take = min(k - off, self.chunk_rows - rel)
            self.chunks[c] = upd(
                self.chunks[c],
                jnp.asarray(rows[off : off + take]),
                jnp.int32(rel),
            )
            off += take

    def take_rows(self, idx: np.ndarray) -> np.ndarray:
        """Host gather of a few rows (planted-cluster seeds etc.)."""
        import jax
        import jax.numpy as jnp

        idx = np.asarray(idx, dtype=np.int64)
        out = np.zeros((idx.size, 32), np.uint32)
        for c in range(len(self.chunks)):
            m = (idx >= c * self.chunk_rows) & (
                idx < (c + 1) * self.chunk_rows
            )
            if not m.any():
                continue
            rel = idx[m] - c * self.chunk_rows
            try:
                out[m] = np.asarray(
                    jnp.take(self.chunks[c], jnp.asarray(rel), axis=0)
                )
            except Exception as e:  # XlaRuntimeError has no stable type
                if "RESOURCE_EXHAUSTED" not in str(e):
                    raise
                # Near the HBM ceiling (measured: a 12.8 GB packed store
                # at 100M hashes) the batched gather's scratch does not
                # fit.  Fall back to one dynamic_slice per row — k is
                # small (planted seeds), so ~k tunnel round trips.
                sl = jax.jit(
                    lambda a, i: jax.lax.dynamic_slice(a, (i, 0), (1, 32))
                )
                out[m] = np.concatenate(
                    [
                        np.asarray(sl(self.chunks[c], jnp.int32(int(r))))
                        for r in rel
                    ],
                    axis=0,
                )
        return out

    def scatter_rows(
        self, idx: np.ndarray, rows: np.ndarray, donate: bool = False
    ) -> None:
        """Scatter host rows at arbitrary indices.

        ``donate=True`` updates each touched chunk in place (no
        chunk-sized copy — decisive at the HBM capacity edge, where
        bench_scale plants clusters into a near-ceiling store) but
        DELETES the old chunk buffer: only safe while this store is the
        sole owner of its chunks.  Any store that has been handed out
        (``IncrementalDeviceLibrary.state()``, ``_grow`` shallow
        copies) shares chunk arrays with the recipient, so the default
        is a non-donating functional update.
        """
        import jax

        import jax.numpy as jnp

        idx = np.asarray(idx, dtype=np.int64)
        rows = np.ascontiguousarray(rows, dtype=np.uint32)

        @functools.partial(
            jax.jit, donate_argnums=(0,) if donate else ()
        )
        def scat(c, ii, rr):
            return c.at[ii].set(rr)

        for c in range(len(self.chunks)):
            m = (idx >= c * self.chunk_rows) & (
                idx < (c + 1) * self.chunk_rows
            )
            if not m.any():
                continue
            self.chunks[c] = scat(
                self.chunks[c],
                jnp.asarray(idx[m] - c * self.chunk_rows),
                jnp.asarray(rows[m]),
            )


@functools.cache
def _window_build_pk_jit(w_rows: int):
    """``_window_build_jit`` with the packed window pre-sliced (the
    chunked-store path slices it across chunks first)."""
    import math

    import jax

    @jax.jit
    def f(pk, bounds_full, at):
        pm = unpack_pm_scan(pk, math.gcd(w_rows, 1024))
        b = jax.lax.dynamic_slice(
            bounds_full, (at // 128, 0), (w_rows // 128, 128)
        ).reshape(w_rows, 1)
        return pm, b

    return f


@functools.cache
def _unpack_window_jit(w_rows: int):
    import math

    import jax

    @jax.jit
    def f(pk):
        return unpack_pm_scan(pk, math.gcd(w_rows, 1024))

    return f


def unpack_pm_scan(pk, chunk: int):
    """uint32[K, 32] packed hashes -> PM_DTYPE[K, 1024] over {-1, +1},
    bit-expanded in ``chunk``-row chunks under ``lax.scan``.

    The one shared +/-1 unpack body for every windowed driver (single-chip
    window build, refs column window, streamed upload, ring and sharded-
    refs operands).  Chunking matters whenever ``pk`` comes out of a
    ``dynamic_slice``: the slice is a fusion barrier, so an unchunked
    bit-expansion MATERIALIZES the u32[K, 32, 32] broadcast temp — 11 GB
    at a 3M-row window.  ``chunk`` must divide ``K``; callers pick
    ``math.gcd(K, 1024..4096)``.
    """
    import jax
    import jax.numpy as jnp

    shifts = jnp.arange(32, dtype=jnp.uint32)[None, None, :]

    def body(_, pkc):
        bits = (pkc[:, :, None] >> shifts) & jnp.uint32(1)
        pm_c = (
            bits.astype(jnp.int8).reshape(chunk, HASH_BITS_PADDED) * 2 - 1
        )
        if PM_DTYPE != "int8":
            pm_c = pm_c.astype(jnp.bfloat16)
        return None, pm_c

    _, pm = jax.lax.scan(body, None, pk.reshape(-1, chunk, 32))
    return pm.reshape(pk.shape[0], HASH_BITS_PADDED)


@functools.cache
def _window_build_jit(w_rows: int):
    import jax

    @jax.jit
    def f(packed_dev, bounds_full, at):
        import math

        pk = jax.lax.dynamic_slice(packed_dev, (at, 0), (w_rows, 32))
        pm = unpack_pm_scan(pk, math.gcd(w_rows, 1024))
        # full-library row metadata is stored [n_pad//128, 128] (row r at
        # [r//128, r%128]): a [n, 1] int32 device array gets lane-padded
        # 128x by TPU tiling (T(1,128)) — ~10 GB per array at 16M hashes.
        # Only the WINDOW is expanded to the [w, 1] layout the kernel
        # blocks expect (an XLA reshape, outside Pallas).
        b = jax.lax.dynamic_slice(
            bounds_full, (at // 128, 0), (w_rows // 128, 128)
        ).reshape(w_rows, 1)
        return pm, b

    return f


def _window_plan(
    n: int, bounds: np.ndarray, geom: Geometry
) -> tuple:
    """Shared windowed-state planning: padded row count, launch metadata,
    window alignment and the minimum legal SINGLE-window size (the widest
    row chunk's whole band span — with one window, every launch's rows
    AND its full column band must fit it; the split-window states escape
    this by decoupling rows from columns).  Returns (bounds_i64, n_pad,
    n_row_chunks, first_ct, n_ct, min_bound, max_row_lo, align, min_w).
    """
    TILE_M, TILE_N, R_TILES, BAND_TILES = geom
    bounds = np.asarray(bounds, dtype=np.int64)
    n_row_tiles = -(-n // TILE_M)
    n_row_chunks = -(-n_row_tiles // R_TILES)
    n_pad = n_row_chunks * R_TILES * TILE_M + (BAND_TILES + 1) * TILE_N
    first_ct, n_ct, min_bound, max_row_lo = _launch_metadata(
        n, bounds, n_row_chunks, geom
    )
    align = int(np.lcm(TILE_M * R_TILES, TILE_N))
    # the compact [rows//128, 128] metadata packing needs 128-aligned
    # row counts (n_pad and every window size are align-multiples)
    assert align % 128 == 0 and n_pad % 128 == 0
    span = 0
    for rt in range(n_row_chunks * R_TILES):
        if n_ct[rt] <= 0:
            continue
        stripes = -(-int(n_ct[rt]) // BAND_TILES)
        last_ct = int(first_ct[rt]) + (stripes - 1) * BAND_TILES
        col_end = (last_ct + BAND_TILES) * TILE_N
        w0 = (rt * TILE_M // align) * align
        span = max(span, col_end - w0, (rt + 1) * TILE_M - w0)
    min_w = -(-span // align) * align
    return (bounds, n_pad, n_row_chunks, first_ct, n_ct, min_bound,
            max_row_lo, align, min_w)


def windowed_need(
    n: int,
    bounds: np.ndarray,
    window_rows: int | None = None,
    geom: Geometry | None = None,
) -> int:
    """Packed-matrix row count a ``WindowedPallasState`` will require
    (``n_pad`` + the resolved window).  Device-born library generators
    size their buffer with this so the state takes the no-copy path
    instead of a multi-GB pad ``concatenate`` (at 64M hashes that copy
    alone transiently doubles an 8.2 GB buffer past HBM)."""
    geom = geom if geom is not None else Geometry()
    (_b, n_pad, _c, _f, _n, _mb, _mr, align, min_w) = _window_plan(
        n, bounds, geom
    )
    if window_rows is None:
        window_rows = 2 * min_w
    w_rows = max(min_w, -(-int(window_rows) // align) * align)
    w_rows = min(w_rows, -(-n_pad // align) * align)
    return -(-n_pad // align) * align + w_rows


def _split_budget_bytes() -> float:
    """Total HBM a split-window sweep may PLAN against (packed store +
    unpacked window operands + bounds).  Measured on the 16 GB v5e
    (BENCH_SCALE_r05.json): the 80M default-window point plans 13.2 GiB
    and sweeps at full rate; the 96M default-window point plans 15.0 GiB
    and is RESOURCE_EXHAUSTED in the counts launch.  Default 14 GiB sits
    between them; ``VDF_SPLIT_BUDGET_GB`` overrides for other devices."""
    return float(os.environ.get("VDF_SPLIT_BUDGET_GB", "14")) * 2**30


def _split_plan_bytes(n_pad: int, align: int, rw: int, cw: int) -> int:
    """Projected device bytes of a split-window sweep at window sizes
    (rw, cw): the packed store (flat or chunked — both keep a short
    last allocation, so roundup waste is negligible), the two unpacked
    +/-1 operand windows, and the padded bounds array."""
    cap = -(-n_pad // align) * align
    need = cap + max(rw, cw)
    pm_b = 1024 if PM_DTYPE == "int8" else 2048
    return need * 128 + (rw + cw) * pm_b + need * 4


def fit_chunk_rows(total_rows: int, align: int = 2048) -> int:
    """Chunk size for a ``ChunkedPackedStore`` holding ``total_rows``:
    the default chunk count, but each chunk shrunk so the ceil-roundup
    waste is < ``align`` rows instead of up to a whole 2 GiB chunk
    (at 100M hashes the default 16M-row chunks round 101M rows up to
    117M — 1.9 GiB of dead HBM exactly where none is spare)."""
    cr_default = _default_chunk_rows()
    k = max(1, -(-int(total_rows) // cr_default))
    cr = -(-(-(-int(total_rows) // k)) // align) * align
    return max(cr, align)


def _resolve_split_windows(
    n_pad: int,
    align: int,
    rows_window_rows: int | None,
    cols_window_rows: int | None,
    geom: Geometry,
) -> tuple[int, int]:
    """Resolve the (rows, cols) window sizes of a split-window state:
    align-rounded, floored at one row chunk / one anchored launch stripe,
    capped at the padded library.

    When BOTH sizes are defaults (no explicit argument, no
    VDF_SPLIT_ROWS_WINDOW/VDF_SPLIT_COLS_WINDOW), they auto-shrink —
    halving together — until the projected sweep footprint
    (``_split_plan_bytes``) fits ``_split_budget_bytes``.  This engages
    only past ~80M hashes on a 16 GB v5e (every committed point below
    that keeps its measured 1M/2M windows) and makes near-ceiling
    libraries pick launchable windows instead of dying
    RESOURCE_EXHAUSTED in the counts launch like the committed
    default-window 96M attempt (BENCH_SCALE_r05.json capacity line).
    Explicit sizes are authoritative and never adjusted."""
    TILE_M, TILE_N, R_TILES, BAND_TILES = geom
    auto = rows_window_rows is None and cols_window_rows is None and (
        "VDF_SPLIT_ROWS_WINDOW" not in os.environ
        and "VDF_SPLIT_COLS_WINDOW" not in os.environ
    )
    rw = int(
        rows_window_rows
        or int(os.environ.get("VDF_SPLIT_ROWS_WINDOW", str(1 << 20)))
    )
    cw = int(
        cols_window_rows
        or int(os.environ.get("VDF_SPLIT_COLS_WINDOW", str(1 << 21)))
    )
    # a launch stripe spans BAND_TILES column tiles; its window anchor is
    # align-floored, so the column window must absorb one extra align
    min_cw = align + (BAND_TILES + 1) * TILE_N
    min_cw = -(-min_cw // align) * align
    rw = max(align, -(-rw // align) * align)
    cw = max(min_cw, -(-cw // align) * align)
    cap = -(-n_pad // align) * align
    rw, cw = min(rw, cap), min(cw, cap)
    if auto:
        budget = _split_budget_bytes()
        while _split_plan_bytes(n_pad, align, rw, cw) > budget and (
            rw > align or cw > min_cw
        ):
            rw = max(align, -(-(rw // 2) // align) * align)
            cw = max(min_cw, -(-(cw // 2) // align) * align)
    return rw, cw


def split_need(
    n: int,
    bounds: np.ndarray,
    rows_window_rows: int | None = None,
    cols_window_rows: int | None = None,
    geom: Geometry | None = None,
) -> int:
    """Packed-matrix row count a ``SplitWindowState`` will require (the
    split-window analogue of ``windowed_need``)."""
    geom = geom if geom is not None else Geometry()
    (_b, n_pad, _c, _f, _n, _mb, _mr, align, _mw) = _window_plan(
        n, bounds, geom
    )
    rw, cw = _resolve_split_windows(
        n_pad, align, rows_window_rows, cols_window_rows, geom
    )
    return -(-n_pad // align) * align + max(rw, cw)


def should_split(
    n: int,
    bounds: np.ndarray,
    geom: Geometry | None = None,
) -> bool:
    """Auto rule: does the single-window state's HBM footprint (packed
    128 B/hash + the MINIMUM legal +/-1 window at 1 KB/row) exceed the
    chip budget?  Above it the split-window state is the only layout
    that fits — its windows are size-free knobs, not band-span-bound.
    ``VDF_FORCE_SPLIT=1/0`` overrides; ``VDF_HBM_BUDGET_GB`` tunes the
    budget (default 12 of a 16 GB v5e, leaving headroom for counts
    buffers, window rebuild transients and the allocator)."""
    force = os.environ.get("VDF_FORCE_SPLIT")
    if force is not None:
        return force == "1"
    geom = geom if geom is not None else Geometry()
    (_b, n_pad, _c, _f, _n, _mb, _mr, align, min_w) = _window_plan(
        n, bounds, geom
    )
    need = -(-n_pad // align) * align + min_w
    footprint = need * 128 + min_w * (
        1024 if PM_DTYPE == "int8" else 2048
    )
    budget = float(os.environ.get("VDF_HBM_BUDGET_GB", "12")) * 2**30
    return footprint > budget


class WindowedPallasState:
    """Sliding-window search state: libraries beyond +/-1 HBM capacity.

    The resident +/-1 operand matrix costs 1 KB/hash (int8 x 1024 bits),
    capping a 16 GB v5e at ~12M hashes.  Here only the PACKED library
    (128 B/hash) is fully device-resident; the +/-1 matrix exists for a
    SLIDING row window.  The duration band is near-diagonal (sorted
    durations), so every launch's rows AND its whole column band fit in a
    window that is a small multiple of the widest band span.  The sweep
    driver slides the window forward as its row cursor advances (each row
    is unpacked ~window/(window-span) ~= 2 times in total — noise next to
    the O(n * band) sweep) and passes window-RELATIVE tile indices to the
    kernel; absolute column ids for the masks ride the wbase scalar.

    Same driver contract as ``PallasSearchState``; requires R_TILES == 1.
    """

    windowed = True
    row_lo_iota = True
    uploaded_rows = None  # the streamed-upload path does not apply

    def __init__(
        self,
        packed: np.ndarray | None,
        bounds: np.ndarray,
        n: int | None = None,
        packed_dev=None,
        window_rows: int | None = None,
        geom: Geometry | None = None,
    ) -> None:
        import jax.numpy as jnp

        self.geom = geom = geom if geom is not None else Geometry()
        TILE_M, TILE_N, R_TILES, BAND_TILES = geom
        assert R_TILES == 1, "windowed sweeps assume single-row-tile chunks"
        if n is None:
            assert packed is not None
            n = packed.shape[0]
        (bounds, n_pad, n_row_chunks, first_ct, n_ct, min_bound,
         max_row_lo, align, min_w) = _window_plan(n, bounds, geom)

        if packed_dev is not None:
            if isinstance(packed_dev, ChunkedPackedStore):
                packed_dev.extend_to(n_pad)
            assert packed_dev.shape[0] >= n_pad
        self.packed_dev = packed_dev  # None: deferred upload, sized below

        bounds_np = np.full(n_pad, -1, dtype=np.int32)
        bounds_np[:n] = np.minimum(bounds, n)

        # window sizing: every single launch (one row tile + its whole
        # BAND_TILES column stripe, anywhere in its band) must fit
        self.window_align = align
        if window_rows is None:
            window_rows = 2 * min_w
        w_rows = max(min_w, -(-int(window_rows) // align) * align)
        self.window_rows = min(w_rows, -(-n_pad // align) * align)
        # the device slice must stay in bounds: pad the packed matrix up
        # to a whole number of windows past n_pad
        need = -(-n_pad // align) * align + self.window_rows
        if packed_dev is None:
            # host-sourced library: DEFER the h2d — upload packed chunks
            # as the window advances (move_window triggers it), so a cold
            # large-N search overlaps its upload with the sweep instead
            # of blocking on one multi-GB transfer up front
            self._chunk = min(
                int(os.environ.get("VDF_STREAM_CHUNK_ROWS", "131072")),
                -(-need // 256) * 256,
            )
            total = -(-need // self._chunk) * self._chunk
            host_pad = np.zeros((total, 32), dtype=np.uint32)
            host_pad[:n] = packed
            self._host_packed: np.ndarray | None = host_pad
            self._uploaded_packed: int | None = 0
            if total * 128 > _max_alloc_bytes():
                # past the single-allocation watermark: chunked store
                self.packed_dev = ChunkedPackedStore.zeros(total)
            else:
                self.packed_dev = jnp.zeros((total, 32), jnp.uint32)
        else:
            self._host_packed = None
            self._uploaded_packed = None
            if packed_dev.shape[0] < need:
                if isinstance(packed_dev, ChunkedPackedStore):
                    packed_dev.extend_to(need)
                    self.packed_dev = packed_dev
                else:
                    pad = jnp.zeros(
                        (need - packed_dev.shape[0], 32), jnp.uint32
                    )
                    self.packed_dev = jnp.concatenate(
                        [packed_dev, pad], axis=0
                    )
        if bounds_np.size < need:
            bounds_np = np.concatenate(
                [bounds_np, np.full(need - n_pad, -1, np.int32)]
            )
        self._bounds_full = jnp.asarray(bounds_np.reshape(-1, 128))

        self.n = n
        self.n_pad = n_pad
        self.n_row_chunks = n_row_chunks
        self.first_ct = first_ct
        self.n_ct = n_ct
        self.min_bound = min_bound
        self.max_row_lo = max_row_lo
        self.max_ct = (n_pad - TILE_N) // TILE_N
        self.w0: int | None = None
        self.pm1 = None
        self.pm1T = None
        self.bounds_dev = None
        self.row_lo_dev = None
        self.rebuilds = 0

    def _ensure_packed(self, rows_needed: int) -> None:
        """Deferred-upload states: make packed rows [0, rows_needed)
        device-resident (chunked h2d that overlaps the sweep of earlier
        windows).  No-op once fully uploaded or for device-born states."""
        if self._uploaded_packed is None:
            return
        import jax.numpy as jnp

        total = self._host_packed.shape[0]
        rows_needed = min(
            -(-max(rows_needed, 0) // self._chunk) * self._chunk, total
        )
        upd = _packed_update_jit()
        chunked = isinstance(self.packed_dev, ChunkedPackedStore)
        while self._uploaded_packed < rows_needed:
            a = self._uploaded_packed
            if chunked:
                self.packed_dev.set_rows(
                    a, self._host_packed[a : a + self._chunk]
                )
            else:
                chunk = jnp.asarray(
                    self._host_packed[a : a + self._chunk]
                )
                self.packed_dev = upd(
                    self.packed_dev, chunk, jnp.int32(a)
                )
            self._uploaded_packed = a + self._chunk
        if self._uploaded_packed >= total:
            self._host_packed = None
            self._uploaded_packed = None

    def move_window(self, w_start: int) -> None:
        """Slide the resident +/-1 window to start at row ``w_start``
        (window_align-aligned).  The caller must ensure no launches are
        still in flight against the previous window (drain counts /
        block on the last dispatch) — otherwise BOTH windows stay live
        in HBM and large libraries OOM during the rebuild."""
        import jax.numpy as jnp

        assert w_start % self.window_align == 0
        self._ensure_packed(w_start + self.window_rows)
        # release our references first so the allocator can reuse the
        # previous window's pages for the new one
        self.pm1 = self.pm1T = self.bounds_dev = self.row_lo_dev = None
        if isinstance(self.packed_dev, ChunkedPackedStore):
            pk = self.packed_dev.slice_rows(w_start, self.window_rows)
            self.pm1, self.bounds_dev = _window_build_pk_jit(
                self.window_rows
            )(pk, self._bounds_full, jnp.int32(w_start))
            del pk
        else:
            fn = _window_build_jit(self.window_rows)
            self.pm1, self.bounds_dev = fn(
                self.packed_dev,
                self._bounds_full,
                jnp.int32(w_start),
            )
        # iota row_lo: the operand slot aliases bounds (never read)
        self.row_lo_dev = self.bounds_dev
        if COLT:
            self.pm1T = _transpose_jit()(self.pm1)
        self.w0 = w_start
        self.rebuilds += 1


class SplitWindowState:
    """Split-window search state: rows and columns slide INDEPENDENTLY.

    ``WindowedPallasState``'s single window must hold a row chunk AND its
    whole duration band, so its minimum size is the widest band span —
    which grows with the library (≈6M rows ≈ 6 GB of int8 operands at
    64M hashes) and, added to the 128 B/hash packed matrix, overflows a
    16 GB v5e somewhere past 32M.  Here the kernel's two operand slots
    (already separate arguments with separate scalar-indexed windows —
    the windowed REFS state exploits the same structure) are fed from
    two small independent windows:

      * a rows window (``rows_window_rows``, default 1M ≈ 1 GB): +/-1
        rows, bounds and the aliased row_lo for the row chunks currently
        being swept, at STATIC positions (each row chunk belongs to
        exactly one),
      * a cols window (``cols_window_rows``, default 2M ≈ 2 GB): +/-1
        columns only, anchored dynamically as the sweep walks each rows
        window's launches in COLUMN order.

    A row chunk's band now spans multiple cols-window positions — the
    launch batcher cuts batches at window boundaries and the driver
    drains counts + finishes phase B before every move, exactly as it
    already did for the single window.  Capacity is therefore bounded by
    the packed matrix alone (128 B/hash): ~100M hashes on 16 GB, with
    the windows as fixed-size knobs.  Reference scaling claim being
    exceeded: vid_dup_finder_lib/src/lib.rs:120-127 ("at least up to 1
    million hashes").

    Same driver contract as ``WindowedPallasState``; requires
    R_TILES == 1 (the production geometry).
    """

    windowed = True
    split = True
    row_lo_iota = True
    rows_static = False
    uploaded_rows = None  # the streamed rows-build path does not apply

    def __init__(
        self,
        packed: np.ndarray | None,
        bounds: np.ndarray,
        n: int | None = None,
        packed_dev=None,
        rows_window_rows: int | None = None,
        cols_window_rows: int | None = None,
        geom: Geometry | None = None,
    ) -> None:
        import jax.numpy as jnp

        self.geom = geom = geom if geom is not None else Geometry()
        TILE_M, TILE_N, R_TILES, BAND_TILES = geom
        assert R_TILES == 1, "split sweeps assume single-row-tile chunks"
        assert not COLT, "split-window states do not support VDF_COLT"
        if n is None:
            assert packed is not None
            n = packed.shape[0]
        (bounds, n_pad, n_row_chunks, first_ct, n_ct, min_bound,
         max_row_lo, align, _min_w) = _window_plan(n, bounds, geom)

        if packed_dev is not None:
            if isinstance(packed_dev, ChunkedPackedStore):
                packed_dev.extend_to(n_pad)
            assert packed_dev.shape[0] >= n_pad
        self.packed_dev = packed_dev

        bounds_np = np.full(n_pad, -1, dtype=np.int32)
        bounds_np[:n] = np.minimum(bounds, n)

        self.window_align = align
        rw, cw = _resolve_split_windows(
            n_pad, align, rows_window_rows, cols_window_rows, geom
        )
        self.rows_window_rows = rw
        self.window_rows = cw  # driver name for the COLS window
        need = -(-n_pad // align) * align + max(rw, cw)
        if packed_dev is None:
            # host-sourced library: deferred chunked h2d, overlapped
            # with the sweep of earlier windows (same scheme as
            # WindowedPallasState._ensure_packed)
            self._chunk = min(
                int(os.environ.get("VDF_STREAM_CHUNK_ROWS", "131072")),
                -(-need // 256) * 256,
            )
            total = -(-need // self._chunk) * self._chunk
            host_pad = np.zeros((total, 32), dtype=np.uint32)
            host_pad[:n] = packed
            self._host_packed: np.ndarray | None = host_pad
            self._uploaded_packed: int | None = 0
            if total * 128 > _max_alloc_bytes():
                # past the single-allocation watermark: chunked store
                self.packed_dev = ChunkedPackedStore.zeros(total)
            else:
                self.packed_dev = jnp.zeros((total, 32), jnp.uint32)
        else:
            self._host_packed = None
            self._uploaded_packed = None
            if packed_dev.shape[0] < need:
                if isinstance(packed_dev, ChunkedPackedStore):
                    packed_dev.extend_to(need)
                    self.packed_dev = packed_dev
                else:
                    pad = jnp.zeros(
                        (need - packed_dev.shape[0], 32), jnp.uint32
                    )
                    self.packed_dev = jnp.concatenate(
                        [packed_dev, pad], axis=0
                    )
        if bounds_np.size < need:
            bounds_np = np.concatenate(
                [bounds_np, np.full(need - n_pad, -1, np.int32)]
            )
        self._bounds_full = jnp.asarray(bounds_np.reshape(-1, 128))

        self.n = n
        self.n_pad = n_pad
        self.n_row_chunks = n_row_chunks
        self.first_ct = first_ct
        self.n_ct = n_ct
        self.min_bound = min_bound
        self.max_row_lo = max_row_lo
        self.max_ct = (n_pad - TILE_N) // TILE_N
        self.w0: tuple[int, int] | None = None
        self.r0: int | None = None
        self.c0: int | None = None
        self.rows_pm = None
        self.pm1 = None  # cols window
        self.pm1T = None
        self.bounds_dev = None
        self.row_lo_dev = None
        self.rebuilds = 0  # cols-window rebuilds
        self.rebuilds_rows = 0

    # deferred packed upload: identical contract to WindowedPallasState
    _ensure_packed = WindowedPallasState._ensure_packed

    def move_window(self, w_start: tuple[int, int]) -> None:
        """Move the rows and/or cols windows to ``(r_start, c_start)``.
        The caller must have drained every launch against the previous
        windows first (the driver's window-boundary sync)."""
        import jax.numpy as jnp

        r_start, c_start = w_start
        assert r_start % self.window_align == 0
        assert c_start % self.window_align == 0
        self._ensure_packed(
            max(r_start + self.rows_window_rows,
                c_start + self.window_rows)
        )
        chunked = isinstance(self.packed_dev, ChunkedPackedStore)
        if r_start != self.r0:
            # release before rebuilding so the allocator reuses pages
            self.rows_pm = self.bounds_dev = self.row_lo_dev = None
            if chunked:
                pk = self.packed_dev.slice_rows(
                    r_start, self.rows_window_rows
                )
                self.rows_pm, self.bounds_dev = _window_build_pk_jit(
                    self.rows_window_rows
                )(pk, self._bounds_full, jnp.int32(r_start))
                del pk
            else:
                fn = _window_build_jit(self.rows_window_rows)
                self.rows_pm, self.bounds_dev = fn(
                    self.packed_dev, self._bounds_full,
                    jnp.int32(r_start),
                )
            # iota row_lo: the operand slot aliases bounds (never read)
            self.row_lo_dev = self.bounds_dev
            self.r0 = r_start
            self.rebuilds_rows += 1
        if c_start != self.c0:
            self.pm1 = None
            if chunked:
                pk = self.packed_dev.slice_rows(
                    c_start, self.window_rows
                )
                self.pm1 = _unpack_window_jit(self.window_rows)(pk)
                del pk
            else:
                self.pm1 = _refs_cols_window_jit(self.window_rows)(
                    self.packed_dev, jnp.int32(c_start)
                )
            self.c0 = c_start
            self.rebuilds += 1
        self.w0 = (r_start, c_start)


def banded_adjacency_pallas(
    packed: np.ndarray | None,
    bounds: np.ndarray,
    tolerance_int: int,
    interpret: bool | None = None,
    state: PallasSearchState | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Banded adjacency sweep via the Pallas chunk kernels (two-phase).

    Same contract as ``hamming.banded_adjacency``: all pairs (i, j) with
    i < j < bounds[i] and hamming <= tolerance_int, lexicographic order.
    Pass a prebuilt ``state`` to skip the upload/unpack setup (``packed``
    may then be None — the incremental-library and windowed paths).

    Phase A sweeps the whole band with the counts-only kernel (512 B of
    HBM output per launch instead of ~1 MB of packed adjacency), so
    hundreds of launches stay in flight and count fetches cost O(1)
    tunnel round-trips per VDF_COUNTS_INFLIGHT batches.  Phase B re-runs
    only the launches that contain matches with the packing kernel and
    extracts pair indices word-wise in one fused jit + one small fetch
    per hit batch.  VDF_SWEEP_SCHEME=onepass selects the previous
    single-pass driver for comparison.
    """
    import jax.numpy as jnp

    if os.environ.get("VDF_SWEEP_SCHEME") == "onepass":
        return _banded_adjacency_onepass(
            packed, bounds, tolerance_int, interpret, state
        )
    if interpret is None:
        interpret = not _is_tpu()

    n = packed.shape[0] if state is None else state.n
    if n == 0:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    bounds = np.asarray(bounds, dtype=np.int64)
    if state is None:
        state = PallasSearchState(packed, bounds)
    geom = state.geom
    TILE_M, TILE_N, R_TILES, BAND_TILES = geom

    sweep_sizes = (8,) if interpret else tuple(
        sorted(set(SWEEP_SIZES), reverse=True)
    )
    launches = _plan_launches(state)
    rows_static = getattr(state, "rows_static", False)
    split = getattr(state, "split", False)
    if rows_static:
        # windowed refs search: rows (refs) stay resident, the cands
        # COLUMN window slides — column-major launch order makes the
        # window advance monotonically over the cands axis
        launches.sort(key=lambda b: b[1][0])
    elif split:
        # split-window self-search: group launches by their (static)
        # rows window, column-major within it, so the rows window
        # advances once per group and the cols window sweeps each
        # group's bands monotonically
        rw_sort = state.rows_window_rows
        launches.sort(
            key=lambda b: (b[0] * TILE_M // rw_sort, min(b[1]), b[0])
        )

    dbg = os.environ.get("VDF_SWEEP_DEBUG") == "1"
    ph = {"dispatch": 0.0, "stream": 0.0, "drain": 0.0, "phase_b": 0.0,
          "fetch_b": 0.0, "drains": 0, "batches": 0, "hits": 0,
          "b_batches": 0}
    is_windowed = getattr(state, "windowed", False)
    # Overlapped A/B pipeline (round 4): once pendingA exceeds
    # 2 * drain_group, the OLDEST drain_group counts drain in one
    # concatenated d2h while later phase-A batches are still executing,
    # and the hit launches found so far are re-dispatched through the
    # packing kernel immediately — phase-B compute and its (batched)
    # result fetch hide behind the remaining phase-A device time instead
    # of serializing after it (the old A -> drain -> B sequencing put one
    # counts round trip plus ~3 phase-B fetches on the critical path at
    # 1M: 0.6-0.8 s end-to-end against a 0.39 s bare kernel).
    drain_group = int(os.environ.get("VDF_COUNTS_DRAIN_GROUP", "8"))
    fetch_b_max = int(os.environ.get("VDF_FETCH_B_MAX", "64"))
    pb_sizes = (8,) if interpret else (PHASE_B_CALLS, 16)
    # Per-tile phase B (VDF_PHASE_B_PER_TILE, default on): phase A
    # counts per (row tile, column tile) instead of per launch stripe,
    # and phase B re-runs ONLY the hit tiles under a BAND_TILES=1
    # geometry — BAND_TILES x less repack work per hit at BAND_TILES x
    # the counts-drain volume.  Measured free in the sparse regime
    # (0.481 s vs 0.47-0.49 s striped at 1M) and 20% faster dense
    # (0.654 s vs 0.812 s at 100k pairs) — BENCH_SCALE_r04.json.
    # Requires single-row-tile chunks; auto-disabled otherwise.
    per_tile_b = (
        os.environ.get("VDF_PHASE_B_PER_TILE", "1") == "1"
        and R_TILES == 1
    )
    geom_b = geom._replace(band_tiles=1) if per_tile_b else geom

    pendingA: list[tuple[list, object]] = []  # (batch, counts handle)
    hits_cur: list[tuple[int, tuple[int, ...]]] = []  # current window
    pendingB: list[tuple[object, int, list]] = []  # (out, size, batch)
    out_i: list[np.ndarray] = []
    out_j: list[np.ndarray] = []
    cur_w: int | None = None  # w_start the current window was built at

    def drain_some(k: int) -> None:
        """Decode the oldest ``k`` pending count handles (one d2h)."""
        take = pendingA[:k]
        del pendingA[:k]
        if not take:
            return
        t0 = time.perf_counter()
        ph["drains"] += 1
        flat = np.asarray(
            jnp.concatenate([c.reshape(-1) for (_, c) in take])
        )
        off = 0
        for batch, counts in take:
            size = int(np.prod(counts.shape))
            cnp = flat[off : off + size].reshape(counts.shape)
            off += size
            if per_tile_b:
                # [calls, BAND_TILES] per-tile counts: each hit TILE
                # becomes its own 1-column-tile phase-B launch
                for k2, t in zip(*np.nonzero(cnp > 0)):
                    if int(k2) < len(batch):
                        rt0, cts = batch[int(k2)]
                        hits_cur.append((rt0, (int(cts[0]) + int(t),)))
                        ph["hits"] += 1
                continue
            for k2 in np.nonzero(cnp.sum(axis=1) > 0)[0]:
                if int(k2) < len(batch):
                    hits_cur.append(batch[int(k2)])
                    ph["hits"] += 1
        ph["drain"] += time.perf_counter() - t0

    def dispatch_b(flush: bool) -> None:
        """Re-run accumulated hit launches with the packing kernel.

        Launches in ``hits_cur`` were counted against the CURRENT window,
        so the packing re-run uses the same resident operands.  Without
        ``flush`` only full PHASE_B_CALLS batches go out; a flush pads the
        remainder into the smallest precompiled bucket."""
        t0 = time.perf_counter()
        while hits_cur:
            if len(hits_cur) >= pb_sizes[0]:
                size = pb_sizes[0]
            elif flush:
                size = next(
                    (s for s in sorted(pb_sizes) if s >= len(hits_cur)),
                    pb_sizes[0],
                )
            else:
                break
            batch = hits_cur[: min(size, len(hits_cur))]
            del hits_cur[: len(batch)]
            run = _build_phase_b(interpret, size, geom_b)
            scalars_all = np.zeros((size, geom.n_scal), np.int32)
            _fill_scalars(
                scalars_all, batch, state, tolerance_int, n, cur_w
            )
            out = run(
                jnp.asarray(scalars_all),
                state.rows_pm if (rows_static or split) else state.pm1,
                state.pm1, state.bounds_dev, state.row_lo_dev,
            )
            pendingB.append((out, size, batch))
            ph["b_batches"] += 1
        ph["phase_b"] += time.perf_counter() - t0

    def fetch_b() -> None:
        """Fetch and decode every pending phase-B result in ONE d2h
        (the per-batch fetches used to cost one ~30-150 ms tunnel round
        trip each).  Blocks until the dispatched phase-B work finishes —
        windowed states call this before moving the window so the old
        window's buffers can release."""
        take = pendingB[:]
        pendingB.clear()
        if not take:
            return
        t0 = time.perf_counter()
        flat = np.asarray(jnp.concatenate([o for (o, _, _) in take]))
        width = 2 * EXTRACT_WORD_CAP + 1
        for bi, (_, size, batch) in enumerate(take):
            arr = flat[bi * width : (bi + 1) * width]
            if not _decode_phase_b(
                arr, size, batch, out_i, out_j, geom_b
            ):
                # word capacity exceeded (rare): per-launch host fallback
                _phase_b_fallback(
                    state, batch, tolerance_int, n, interpret, out_i,
                    out_j, geom_b,
                )
        ph["fetch_b"] += time.perf_counter() - t0

    pm1 = state.pm1
    rowsA = state.rows_pm if (rows_static or split) else pm1
    colsA = state.pm1T if COLT else state.pm1
    bounds_dev = state.bounds_dev
    for batch, w_start in _gen_batches(state, launches, sweep_sizes):
        sweep_calls = next(
            (s for s in sorted(sweep_sizes) if s >= len(batch)),
            sweep_sizes[0],
        )
        counts_fn = _build_sweep_counts(
            interpret, sweep_calls, geom, per_tile_b
        )
        if is_windowed:
            if w_start != state.w0:
                # finish EVERYTHING against the previous window first:
                # drain its counts, dispatch + fetch its phase B (the
                # fetch blocks until the queued launches finish), so the
                # old and new window buffers never coexist in HBM — and
                # phase B never has to re-slide windows in a second pass.
                drain_some(len(pendingA))
                dispatch_b(flush=True)
                fetch_b()
                pm1 = colsA = bounds_dev = None
                t0 = time.perf_counter()
                state.move_window(w_start)
                ph["stream"] += time.perf_counter() - t0
            pm1 = state.pm1
            if split:
                rowsA = state.rows_pm
            elif not rows_static:
                rowsA = pm1
            colsA = state.pm1T if COLT else state.pm1
            bounds_dev = state.bounds_dev
            cur_w = w_start
        if state.uploaded_rows is not None:
            # streamed build: h2d overlaps the counts sweep
            need = 0
            for rt0, cts in batch:
                need = max(
                    need,
                    (rt0 + R_TILES) * TILE_M,
                    (max(cts) + BAND_TILES) * TILE_N,
                )
            t0 = time.perf_counter()
            state.ensure_rows(need)
            ph["stream"] += time.perf_counter() - t0
            pm1 = rowsA = colsA = state.pm1
        scalars_all = np.zeros((sweep_calls, geom.n_scal), np.int32)
        _fill_scalars(scalars_all, batch, state, tolerance_int, n, w_start)
        t0 = time.perf_counter()
        counts = counts_fn(
            jnp.asarray(scalars_all), rowsA, colsA, bounds_dev,
            state.row_lo_dev,
        )
        ph["dispatch"] += time.perf_counter() - t0
        ph["batches"] += 1
        pendingA.append((batch, counts))
        if interpret:
            # emulated buffers: fully synchronous per batch
            drain_some(len(pendingA))
            dispatch_b(flush=True)
            fetch_b()
        elif len(pendingA) >= 2 * drain_group:
            drain_some(drain_group)
            dispatch_b(flush=False)
            # windowed states only fetch at window boundaries: a mid-
            # stream fetch could take the _phase_b_fallback path, whose
            # exact recompute re-slides the window under the launches
            # still being dispatched against the current one
            if not is_windowed and len(pendingB) >= fetch_b_max:
                fetch_b()
    # Tail: with few total batches (8 at 1M resident) the single
    # drain_some(ALL) returns only after the device idles, so every
    # phase-B launch then serializes behind one counts round trip.  An
    # eager tail drains the oldest tail_group batches at a time and
    # dispatches full phase-B buckets between drains — those launches
    # queue behind the still-executing phase-A batches, so B compute
    # runs during the final counts RTT instead of after it.  Each extra
    # tail drain costs one tunnel d2h (30-150 ms) that overlaps device
    # execution; the floor is kernel + 2 RTTs (last counts d2h, B
    # results d2h).  Knob-gated pending the silicon A/B.
    tail_group = int(os.environ.get("VDF_TAIL_DRAIN_GROUP", "0"))
    if tail_group > 0 and not interpret:
        while pendingA:
            drain_some(min(tail_group, len(pendingA)))
            if pendingA:
                dispatch_b(flush=False)
    else:
        drain_some(len(pendingA))
    dispatch_b(flush=True)
    fetch_b()

    if dbg:
        print(
            "# sweep phases: "
            + " ".join(
                f"{k}={v:.3f}s" if isinstance(v, float) else f"{k}={v}"
                for k, v in ph.items()
            ),
            file=sys.stderr,
        )
    global LAST_SWEEP_PHASES
    LAST_SWEEP_PHASES = dict(ph)

    if not out_i:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    ii = np.concatenate(out_i)
    jj = np.concatenate(out_j)
    order = np.lexsort((jj, ii))
    return ii[order], jj[order]


def _phase_b_fallback(
    state,
    batch: list[tuple[int, tuple[int, ...]]],
    tolerance_int: int,
    n: int,
    interpret: bool,
    out_i: list[np.ndarray],
    out_j: list[np.ndarray],
    geom_b: "Geometry | None" = None,
) -> None:
    """Word-capacity overflow path: re-run each launch singly with the
    packing kernel, fetch its packed tiles wholesale, and bit-extract on
    host.  Only reached when one phase-B batch holds more than
    EXTRACT_WORD_CAP matching words.  ``geom_b``: the phase-B geometry
    (BAND_TILES=1 under the per-tile knob)."""
    import jax.numpy as jnp

    geom = geom_b if geom_b is not None else state.geom
    TILE_M, TILE_N, R_TILES, BAND_TILES = geom
    fn = _build_chunk(interpret, geom)
    is_windowed = getattr(state, "windowed", False)
    rows_static = getattr(state, "rows_static", False)
    split = getattr(state, "split", False)
    for rt0, cts in batch:
        w_start = None
        if is_windowed:
            align = state.window_align
            total = int(state.packed_dev.shape[0])
            wmax = total - state.window_rows
            if split:
                rw = state.rows_window_rows
                w_start = (
                    min(rt0 * TILE_M // rw * rw, total - rw),
                    min(min(cts) * TILE_N // align * align, wmax),
                )
            else:
                anchor = (
                    min(cts) * TILE_N if rows_static else rt0 * TILE_M
                )
                w_start = min((anchor // align) * align, wmax)
            if w_start != state.w0:
                state.move_window(w_start)
        scal = np.zeros((1, geom.n_scal), np.int32)
        _fill_scalars(scal, [(rt0, cts)], state, tolerance_int, n, w_start)
        packed_t, _ = fn(
            jnp.asarray(scal[0]),
            state.rows_pm if (rows_static or split) else state.pm1,
            state.pm1, state.bounds_dev, state.row_lo_dev,
        )
        tiles = np.asarray(packed_t)
        for i in range(R_TILES):
            for j in range(BAND_TILES):
                roff, coff = _tile_bits_to_pairs(tiles[i, j])
                out_i.append(roff.astype(np.int64) + (rt0 + i) * TILE_M)
                out_j.append(coff.astype(np.int64) + (cts[i] + j) * TILE_N)


def _banded_adjacency_onepass(
    packed: np.ndarray | None,
    bounds: np.ndarray,
    tolerance_int: int,
    interpret: bool | None = None,
    state: PallasSearchState | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Single-pass driver: the packing kernel sweeps the whole band,
    writing packed adjacency for EVERY tile (~1 MB/launch held in flight).

    Superseded as the default by the two-phase driver in
    ``banded_adjacency_pallas`` (counts-only sweep + hit-launch repack),
    whose in-flight state is 512 B/launch; kept selectable
    (VDF_SWEEP_SCHEME=onepass) as a comparison point and fallback.
    """
    import jax.numpy as jnp

    if interpret is None:
        interpret = not _is_tpu()

    n = packed.shape[0] if state is None else state.n
    if n == 0:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    bounds = np.asarray(bounds, dtype=np.int64)

    if state is None:
        state = PallasSearchState(packed, bounds)
    geom = state.geom
    TILE_M, TILE_N, R_TILES, BAND_TILES = geom
    pm1 = state.pm1
    bounds_dev = state.bounds_dev

    # small scan batches in interpret mode (tests): padded launches are
    # pure waste there, and the jit wrapper is re-traced anyway
    sweep_sizes = (8,) if interpret else tuple(
        sorted(set(SWEEP_SIZES), reverse=True)
    )

    launches = _plan_launches(state)

    # Phase 2: run launches in fixed-size scan batches (one jit call per
    # SWEEP_CALLS launches — per-launch Python dispatch costs more than the
    # launch itself on a single-core host), fetch all counts in one d2h per
    # batch, and transfer only the tiles that contain matches.
    out_i: list[np.ndarray] = []
    out_j: list[np.ndarray] = []
    hit_tiles: list[tuple[object, int, int]] = []
    dbg = os.environ.get("VDF_SWEEP_DEBUG") == "1"
    ph = {"dispatch": 0.0, "stream": 0.0, "drain": 0.0, "extract": 0.0,
          "drains": 0, "batches": 0}

    def process_counts(batch, counts_np, packed_all) -> None:
        for k, i, j in zip(*np.nonzero(counts_np > 0)):
            rt0, cts = batch[int(k)]
            # slice the hit tile out (device op; frees the batch buffer)
            # and defer the transfer: per-tile d2h latency (~30 ms) was a
            # fixed ~6 s cost whenever matches existed.
            hit_tiles.append(
                (
                    packed_all[int(k), int(i), int(j)],
                    (rt0 + int(i)) * TILE_M,
                    (cts[int(i)] + int(j)) * TILE_N,
                )
            )

    # Keep a window of sweep batches in flight, then fetch the window's
    # counts in ONE concatenated d2h: per-batch fetches put a ~0.25 s
    # tunnel round-trip each on the critical path (the 1M sweep ran 2.1 s
    # against a 0.55 s launch floor; at 4M, where fetches amortize, the
    # sweep sits AT the floor).  Each in-flight batch holds its packed
    # output (~1 GB at the default geometry) in HBM, bounding the window.
    max_inflight = int(os.environ.get("VDF_SWEEP_INFLIGHT", "6"))
    inflight: list[tuple[list, object, object]] = []

    def drain_inflight() -> None:
        if not inflight:
            return
        t0 = time.perf_counter()
        ph["drains"] += 1
        flat = np.asarray(
            jnp.concatenate(
                [c.reshape(-1) for (_, _, c) in inflight]
            )
        )
        off = 0
        for batch, packed_all, counts_all in inflight:
            size = int(np.prod(counts_all.shape))
            counts_np = flat[off : off + size].reshape(counts_all.shape)
            off += size
            process_counts(batch, counts_np, packed_all)
        inflight.clear()
        ph["drain"] += time.perf_counter() - t0

    is_windowed = getattr(state, "windowed", False)

    for batch, w_start in _gen_batches(state, launches, sweep_sizes):
        # smallest precompiled batch size that fits this batch
        sweep_calls = next(
            (s for s in sorted(sweep_sizes) if s >= len(batch)),
            sweep_sizes[0],
        )
        sweep_fn = _build_sweep(interpret, sweep_calls, geom)
        if is_windowed:
            if w_start != state.w0:
                # in-flight batches read the previous window buffers
                drain_inflight()
                pm1 = bounds_dev = None
                t0 = time.perf_counter()
                state.move_window(w_start)
                ph["stream"] += time.perf_counter() - t0
            pm1 = state.pm1
            bounds_dev = state.bounds_dev
        if state.uploaded_rows is not None:
            # streamed build: make this batch's rows AND column window
            # resident before dispatching; later rows keep uploading
            # while these launches run (h2d/compute overlap)
            need = 0
            for rt0, cts in batch:
                need = max(
                    need,
                    (rt0 + R_TILES) * TILE_M,
                    (max(cts) + BAND_TILES) * TILE_N,
                )
            t0 = time.perf_counter()
            state.ensure_rows(need)
            ph["stream"] += time.perf_counter() - t0
            pm1 = state.pm1
        scalars_all = np.zeros((sweep_calls, geom.n_scal), dtype=np.int32)
        _fill_scalars(scalars_all, batch, state, tolerance_int, n, w_start)
        t0 = time.perf_counter()
        packed_all, counts_all = sweep_fn(
            jnp.asarray(scalars_all), pm1, pm1, bounds_dev,
            state.row_lo_dev,
        )
        ph["dispatch"] += time.perf_counter() - t0
        ph["batches"] += 1
        if interpret:
            # emulated buffers: process eagerly, no windowing
            process_counts(
                batch, np.asarray(counts_all), packed_all
            )
        else:
            inflight.append((batch, packed_all, counts_all))
            if len(inflight) >= max_inflight:
                drain_inflight()
    drain_inflight()

    # Phase 3: batched index-only extraction of all hit tiles (device
    # stacks + one sized nonzero + one small index fetch per round).
    t_extract0 = time.perf_counter()
    _, _, extract_tiles = _v4_jits()
    zero_tile = jnp.zeros((TILE_M // 32, TILE_N), jnp.int32)
    for s0 in range(0, len(hit_tiles), EXTRACT_ROUND):
        round_hits = hit_tiles[s0 : s0 + EXTRACT_ROUND]
        tiles = [t for (t, _, _) in round_hits]
        tiles += [zero_tile] * (EXTRACT_ROUND - len(tiles))
        hh, rr, bb, cc = (np.asarray(a) for a in extract_tiles(*tiles))
        valid = hh >= 0
        if not (~valid).any():
            # index capacity possibly exceeded: per-tile fallback
            for t, rbase, cbase in round_hits:
                roff, coff = _tile_bits_to_pairs(np.asarray(t))
                out_i.append(roff.astype(np.int64) + rbase)
                out_j.append(coff.astype(np.int64) + cbase)
            continue
        hh, rr, bb, cc = hh[valid], rr[valid], bb[valid], cc[valid]
        rbases = np.array(
            [h[1] for h in round_hits]
            + [0] * (EXTRACT_ROUND - len(round_hits)),
            dtype=np.int64,
        )
        cbases = np.array(
            [h[2] for h in round_hits]
            + [0] * (EXTRACT_ROUND - len(round_hits)),
            dtype=np.int64,
        )
        out_i.append(rbases[hh] + rr.astype(np.int64) * 32 + bb)
        out_j.append(cbases[hh] + cc.astype(np.int64))

    if dbg:
        ph["extract"] = time.perf_counter() - t_extract0
        print(
            "# sweep phases: "
            + " ".join(f"{k}={v:.3f}s" if isinstance(v, float) else f"{k}={v}"
                       for k, v in ph.items()),
            file=sys.stderr,
        )

    if not out_i:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    ii = np.concatenate(out_i)
    jj = np.concatenate(out_j)
    order = np.lexsort((jj, ii))
    return ii[order], jj[order]


def refs_adjacency_pallas(
    refs_packed: np.ndarray,
    cands_packed: np.ndarray | None,
    lo: np.ndarray,
    hi: np.ndarray,
    tolerance_int: int,
    interpret: bool | None = None,
    cands_dev=None,
    n_cands: int | None = None,
    geom: Geometry | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """References-vs-candidates adjacency on the Pallas sweep kernel.

    All pairs (i, j) with lo[i] <= j < hi[i] and hamming <= tolerance,
    lexicographic — the device path for ``search_with_references``
    (video_dup_finder.rs:19-46's [0.95d, 1.05d] window).  The refs rows
    are appended AFTER the candidate block in one device matrix, and the
    kernel's generalized per-row [row_lo + 1, bounds) window does the
    rest: row_lo = lo - 1, bounds = hi (the self-search is the special
    case row_lo = own index).

    ``cands_dev`` (+ ``n_cands``): a DEVICE-RESIDENT duration-sorted
    packed candidate matrix (uint32[>= n_cands, 32], e.g. gathered from
    an ``IncrementalDeviceLibrary``) replaces the host ``cands_packed``
    — the combined [cands | refs] matrix is assembled on device and only
    the refs (128 B each) ride h2d, eliminating the library re-upload
    that made cold multi-reference searches upload-bound (round-2
    VERDICT weak #6).
    """
    import jax.numpy as jnp

    geom = geom if geom is not None else Geometry()
    TILE_M, TILE_N, R_TILES, BAND_TILES = geom
    r = refs_packed.shape[0]
    n = int(n_cands) if cands_dev is not None else cands_packed.shape[0]
    if r == 0 or n == 0:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    lo = np.asarray(lo, dtype=np.int64)
    hi = np.asarray(hi, dtype=np.int64)

    # combined layout: [cands (tile-padded) | refs (tile-padded)]
    n_col_pad = -(-n // TILE_N) * TILE_N + (BAND_TILES + 1) * TILE_N
    ref0 = n_col_pad  # first refs row (row-tile aligned: TILE_N % TILE_M == 0)
    n_ref_tiles = -(-r // TILE_M)
    n_ref_chunks = -(-n_ref_tiles // R_TILES)
    n_pad = ref0 + n_ref_chunks * R_TILES * TILE_M

    bounds_full = np.full(n_pad, -1, dtype=np.int64)
    bounds_full[ref0 : ref0 + r] = np.minimum(hi, n)
    row_lo_full = np.full(n_pad, _ROW_LO_SENTINEL, dtype=np.int64)
    row_lo_full[ref0 : ref0 + r] = lo - 1

    if cands_dev is not None:
        refs_pad = np.zeros(
            (n_pad - ref0, refs_packed.shape[1]), np.uint32
        )
        refs_pad[:r] = refs_packed
        combined = _refs_combine_jit()(
            cands_dev[:n],
            jnp.asarray(refs_pad),
            n_pad,
        )
        state = _RefsState(
            None, bounds_full, row_lo_full, n, ref0, r,
            combined_dev=combined, geom=geom,
        )
    else:
        packed_pad = np.zeros((n_pad, cands_packed.shape[1]), np.uint32)
        packed_pad[:n] = cands_packed
        packed_pad[ref0 : ref0 + r] = refs_packed
        state = _RefsState(
            packed_pad, bounds_full, row_lo_full, n, ref0, r, geom=geom
        )
    ii, jj = banded_adjacency_pallas(
        None, bounds_full, tolerance_int, interpret=interpret, state=state
    )
    return ii - ref0, jj


@functools.cache
def _refs_meta_jit():
    """Device build of the combined matrix's bounds/row_lo columns from
    the refs-region rows alone (candidate rows are all sentinels)."""
    import functools as _ft

    import jax
    import jax.numpy as jnp

    @_ft.partial(jax.jit, static_argnums=(2, 3))
    def f(bounds_rows, row_lo_rows, n_pad, ref0):
        b = jnp.full((n_pad, 1), -1, jnp.int32)
        b = jax.lax.dynamic_update_slice(b, bounds_rows[:, None], (ref0, 0))
        r = jnp.full((n_pad, 1), _ROW_LO_SENTINEL, jnp.int32)
        r = jax.lax.dynamic_update_slice(r, row_lo_rows[:, None], (ref0, 0))
        return b, r

    return f


@functools.cache
def _refs_combine_jit():
    """Device assembly of the [cands | refs] combined packed matrix: the
    candidate block stays resident, only the (small) refs block rides
    h2d."""
    import functools as _ft

    import jax
    import jax.numpy as jnp

    @_ft.partial(jax.jit, static_argnums=(2,))
    def f(cands_dev, refs_rows, n_pad):
        buf = jnp.zeros((n_pad, 32), jnp.uint32)
        buf = jax.lax.dynamic_update_slice(buf, cands_dev, (0, 0))
        buf = jax.lax.dynamic_update_slice(
            buf, refs_rows, (n_pad - refs_rows.shape[0], 0)
        )
        return buf

    return f


class _RefsState(PallasSearchState):
    """PallasSearchState over the combined [cands | refs] matrix, with
    launch metadata covering only the refs row tiles."""

    row_lo_iota = False  # per-ref [0.95d, 1.05d] lower bounds are data

    def __init__(self, packed_pad, bounds_full, row_lo_full, n_cands,
                 ref0, r, combined_dev=None,
                 geom: Geometry | None = None) -> None:
        import jax.numpy as jnp

        self.geom = geom = geom if geom is not None else Geometry()
        TILE_M, TILE_N, R_TILES, BAND_TILES = geom
        # the floor-divisions below silently DROP trailing refs tiles if
        # the refs region start isn't chunk-aligned; the default geometry
        # guarantees it, non-default knobs must too
        assert R_TILES == 1, "refs search assumes single-row-tile chunks"
        assert ref0 % TILE_M == 0 and TILE_N % TILE_M == 0, (
            "refs region must start row-tile aligned (TILE_N % TILE_M)"
        )
        n_pad = (
            combined_dev.shape[0] if packed_pad is None
            else packed_pad.shape[0]
        )
        assert n_pad % TILE_M == 0
        self.uploaded_rows = None
        if packed_pad is None:
            # resident-library path: combined matrix assembled on device
            self.pm1 = unpack_pm1_device(combined_dev)
        else:
            self.pm1 = unpack_pm1_device(jnp.asarray(packed_pad))
        self.pm1T = _transpose_jit()(self.pm1) if COLT else None
        self.pm1.block_until_ready()

        if packed_pad is None:
            # metadata built on device from the (small) refs region only:
            # uploading full [n_pad, 1] arrays cost ~8 MB of h2d per
            # search — real time through the dev tunnel
            self.bounds_dev, self.row_lo_dev = _refs_meta_jit()(
                jnp.asarray(bounds_full[ref0:].astype(np.int32)),
                jnp.asarray(row_lo_full[ref0:].astype(np.int32)),
                n_pad,
                ref0,
            )
        else:
            self.bounds_dev = jnp.asarray(
                bounds_full.astype(np.int32)[:, None]
            )
            self.row_lo_dev = jnp.asarray(
                row_lo_full.astype(np.int32)[:, None]
            )

        n_tiles = n_pad // TILE_M
        first_ct = np.zeros(n_tiles, dtype=np.int64)
        n_ct = np.zeros(n_tiles, dtype=np.int64)
        min_bound = np.zeros(n_tiles, dtype=np.int64)
        max_row_lo = np.full(n_tiles, _ROW_LO_SENTINEL, dtype=np.int64)
        ref_t0 = ref0 // TILE_M
        for rt in range(ref_t0, n_tiles):
            r0 = rt * TILE_M
            r1 = min(r0 + TILE_M, ref0 + r)
            if r0 >= ref0 + r:
                continue
            ct0 = int(row_lo_full[r0:r1].min() + 1) // TILE_N
            c_end = int(bounds_full[r0:r1].max())
            first_ct[rt] = ct0
            n_ct[rt] = max(0, -(-(c_end - ct0 * TILE_N) // TILE_N))
            min_bound[rt] = int(bounds_full[r0:r1].min())
            if r1 == r0 + TILE_M:
                max_row_lo[rt] = int(row_lo_full[r0:r1].max())
        # the driver iterates row chunks [0, n_row_chunks); start at the
        # refs region by reporting only those chunks and offsetting in
        # first_ct/n_ct indexing (chunk_idx * R_TILES is an absolute row
        # tile index, so metadata arrays stay absolute-indexed)
        self.n = n_cands  # kernel's col clamp only
        self.n_pad = n_pad
        self.n_row_chunks = n_tiles // R_TILES
        self.first_ct = first_ct
        self.n_ct = n_ct
        self.min_bound = min_bound
        self.max_row_lo = max_row_lo
        self.max_ct = (n_pad - TILE_N) // TILE_N


@functools.cache
def _refs_cols_window_jit(w_rows: int):
    """uint32[*, 32] packed cands -> one +/-1 COLUMN window
    [w_rows, 1024] starting at row ``at`` (chunked under lax.scan like
    ``_window_build_jit``; no bounds slice — refs-row metadata is static
    and lives in refs space, not cands space)."""
    import math

    import jax

    @jax.jit
    def f(packed_dev, at):
        pk = jax.lax.dynamic_slice(packed_dev, (at, 0), (w_rows, 32))
        return unpack_pm_scan(pk, math.gcd(w_rows, 1024))

    return f


class WindowedRefsState:
    """Windowed references-vs-candidates search state (round-3 VERDICT
    missing #4 / next-round item 3): the refs ROWS (+ their per-row
    [0.95d, 1.05d) metadata, ``video_dup_finder.rs:19-46``) stay fully
    resident — they are tiny — while the CANDIDATE axis follows the
    ``WindowedPallasState`` recipe: the packed library (128 B/hash) is
    fully device-resident and the 1 KB/hash +/-1 expansion exists only
    for a sliding COLUMN window, so refs-vs-16M-candidate searches never
    materialize a 16 GB operand.

    Shape bucketing (round-3 VERDICT weak #5): the refs row pad rounds
    up to a power-of-two number of row tiles and the column window is a
    power-of-two number of column tiles (capped by VDF_REFS_WINDOW_ROWS),
    so the expensive sweep jits — whose signatures see only
    [r_pad, 1024] rows, [window_rows, 1024] cols and the launch-scalar
    batch — repeat across nearby (r, n) shapes and hit the persistent
    compile cache instead of paying ~23 s of first-call specialization
    per novel pair.

    Plugs into ``banded_adjacency_pallas``'s windowed driver via
    ``rows_static = True``: row-tile indices stay absolute (refs space),
    only column tiles are window-relative, and the driver orders
    launches column-major so the window slides monotonically.
    """

    windowed = True
    row_lo_iota = False  # per-ref lower bounds are data
    rows_static = True
    uploaded_rows = None  # the streamed rows-build path does not apply

    def __init__(
        self,
        refs_packed: np.ndarray,
        lo: np.ndarray,
        hi: np.ndarray,
        n_cands: int,
        cands_packed: np.ndarray | None = None,
        cands_dev=None,
        window_rows: int | None = None,
        geom: Geometry | None = None,
    ) -> None:
        import jax.numpy as jnp

        self.geom = geom = geom if geom is not None else Geometry()
        TILE_M, TILE_N, R_TILES, BAND_TILES = geom
        assert R_TILES == 1, "refs search assumes single-row-tile chunks"
        assert not COLT, "windowed refs states do not support VDF_COLT"
        r = refs_packed.shape[0]
        n = int(n_cands)
        lo = np.asarray(lo, dtype=np.int64)
        hi = np.asarray(hi, dtype=np.int64)

        # refs rows: power-of-two row-tile bucket
        r_tiles = max(1, -(-r // TILE_M))
        r_tiles = 1 << (r_tiles - 1).bit_length()
        r_pad = r_tiles * TILE_M
        refs_pad = np.zeros((r_pad, 32), np.uint32)
        refs_pad[:r] = refs_packed
        self.rows_pm = unpack_pm1_device(jnp.asarray(refs_pad))
        bounds_np = np.full((r_pad, 1), -1, dtype=np.int32)
        bounds_np[:r, 0] = np.minimum(hi, n)
        row_lo_np = np.full((r_pad, 1), _ROW_LO_SENTINEL, dtype=np.int32)
        row_lo_np[:r, 0] = np.maximum(lo, 0) - 1
        self.bounds_dev = jnp.asarray(bounds_np)
        self.row_lo_dev = jnp.asarray(row_lo_np)

        # per-refs-tile launch metadata over the cands axis; partial
        # tiles keep the sentinel max_row_lo so the kernel's interior
        # fast path never skips masking across pad rows
        first_ct = np.zeros(r_tiles, dtype=np.int64)
        n_ct = np.zeros(r_tiles, dtype=np.int64)
        min_bound = np.zeros(r_tiles, dtype=np.int64)
        max_row_lo = np.full(r_tiles, _ROW_LO_SENTINEL, dtype=np.int64)
        for rt in range(r_tiles):
            r0 = rt * TILE_M
            r1 = min(r0 + TILE_M, r)
            if r0 >= r:
                continue
            ct0 = int(max(int(lo[r0:r1].min()), 0)) // TILE_N
            c_end = int(min(int(hi[r0:r1].max()), n))
            first_ct[rt] = ct0
            n_ct[rt] = max(0, -(-(c_end - ct0 * TILE_N) // TILE_N))
            min_bound[rt] = int(min(int(hi[r0:r1].min()), n))
            if r1 == r0 + TILE_M:
                max_row_lo[rt] = int(lo[r0:r1].max()) - 1

        # candidate axis: packed resident, +/-1 only per column window
        n_cpad = (
            -(-max(n, 1) // TILE_N) * TILE_N + (BAND_TILES + 1) * TILE_N
        )
        self.window_align = align = TILE_N
        assert align % 128 == 0
        cap_rows = (
            int(window_rows)
            if window_rows
            else int(os.environ.get("VDF_REFS_WINDOW_ROWS", str(1 << 21)))
        )
        cap_tiles = max(-(-cap_rows // TILE_N), BAND_TILES + 1)
        need_tiles = -(-n_cpad // TILE_N)
        w_tiles = 1 << (min(need_tiles, cap_tiles) - 1).bit_length()
        self.window_rows = w_rows = w_tiles * TILE_N
        need = -(-n_cpad // align) * align + w_rows

        if isinstance(cands_dev, ChunkedPackedStore):
            # chunked store (candidates past the single-allocation
            # watermark): rows beyond the library's n are zeros by
            # construction and masked by the kernel's n clamp; shallow-
            # copy the chunk list so the slide-room extension never
            # mutates the library's own store
            store = ChunkedPackedStore(
                list(cands_dev.chunks), cands_dev.chunk_rows
            )
            store.extend_to(need)
            self.packed_dev = store
            self._host_packed: np.ndarray | None = None
            self._uploaded_packed: int | None = None
        elif cands_dev is not None:
            # device-born candidates: zero-pad on device, no h2d
            pad = jnp.zeros((need - n, 32), jnp.uint32)
            self.packed_dev = jnp.concatenate([cands_dev[:n], pad])
            self._host_packed = None
            self._uploaded_packed = None
        else:
            # host-sourced: deferred chunked h2d, overlapped with the
            # sweep of earlier windows (same scheme as
            # WindowedPallasState._ensure_packed)
            self._chunk = min(
                int(os.environ.get("VDF_STREAM_CHUNK_ROWS", "131072")),
                -(-need // 256) * 256,
            )
            total = -(-need // self._chunk) * self._chunk
            host_pad = np.zeros((total, 32), dtype=np.uint32)
            host_pad[:n] = cands_packed[:n]
            self._host_packed = host_pad
            self._uploaded_packed = 0
            if total * 128 > _max_alloc_bytes():
                self.packed_dev = ChunkedPackedStore.zeros(total)
            else:
                self.packed_dev = jnp.zeros((total, 32), jnp.uint32)

        self.n = n
        self.n_pad = n_cpad
        self.n_row_chunks = r_tiles
        self.first_ct = first_ct
        self.n_ct = n_ct
        self.min_bound = min_bound
        self.max_row_lo = max_row_lo
        self.max_ct = (n_cpad - TILE_N) // TILE_N
        self.w0: int | None = None
        self.pm1 = None
        self.pm1T = None
        self.rebuilds = 0

    # deferred packed upload: identical contract to WindowedPallasState
    _ensure_packed = WindowedPallasState._ensure_packed

    def move_window(self, w_start: int) -> None:
        """Slide the resident +/-1 COLUMN window to start at candidate
        row ``w_start`` (refs rows/metadata never move)."""
        import jax.numpy as jnp

        assert w_start % self.window_align == 0
        self._ensure_packed(w_start + self.window_rows)
        self.pm1 = None  # release before rebuilding
        if isinstance(self.packed_dev, ChunkedPackedStore):
            pk = self.packed_dev.slice_rows(w_start, self.window_rows)
            self.pm1 = _unpack_window_jit(self.window_rows)(pk)
            del pk
        else:
            self.pm1 = _refs_cols_window_jit(self.window_rows)(
                self.packed_dev, jnp.int32(w_start)
            )
        self.w0 = w_start
        self.rebuilds += 1


def refs_adjacency_windowed(
    refs_packed: np.ndarray,
    lo: np.ndarray,
    hi: np.ndarray,
    tolerance_int: int,
    cands_packed: np.ndarray | None = None,
    cands_dev=None,
    n_cands: int | None = None,
    interpret: bool | None = None,
    window_rows: int | None = None,
    geom: Geometry | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """References-vs-candidates adjacency with a sliding candidate
    window: all pairs (i, j), i a refs row, lo[i] <= j < hi[i], hamming
    <= tolerance_int, in lexicographic order — output-identical to
    ``refs_adjacency_pallas`` but scaling to candidate libraries beyond
    +/-1 HBM capacity (and with bucketed jit shapes; see
    ``WindowedRefsState``).  ``cands_dev`` + ``n_cands``: device-resident
    packed candidates (refs-only h2d); else ``cands_packed`` rides a
    deferred chunked upload."""
    r = refs_packed.shape[0]
    n = int(n_cands) if cands_dev is not None else cands_packed.shape[0]
    if r == 0 or n == 0:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    state = WindowedRefsState(
        refs_packed, lo, hi, n,
        cands_packed=cands_packed, cands_dev=cands_dev,
        window_rows=window_rows, geom=geom,
    )
    return banded_adjacency_pallas(
        None, np.zeros(0, np.int64), tolerance_int,
        interpret=interpret, state=state,
    )
