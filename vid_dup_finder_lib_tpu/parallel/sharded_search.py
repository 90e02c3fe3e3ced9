"""Sharded hash generation and ring all-pairs candidate scan.

Multi-chip layout (SURVEY.md section 2.7): the hash *batch* axis is data
parallel; the all-pairs search shards the library axis N — each chip holds
a row block of the +/-1 hash matrix, and column blocks rotate around the
ring with ``jax.lax.ppermute`` so every chip computes its row-block-vs-
rotating-column-block distance tile each step.  O(N^2 / n_chips) MXU work
per chip with the permute overlapped by XLA; collectives ride ICI.

Two scan variants share the ring layout:

* ``ring_candidate_scan`` — fixed-shape per-row statistics (match count,
  best-match distance/index): the cheap probe for N too large to
  materialize adjacency.
* ``banded_adjacency_ring`` — EXACT pair extraction: each rotation step
  emits a bit-packed adjacency block (1 bit/pair, the same trick as
  ``ops/hamming_pallas.py``) plus a per-shard match count; the host
  fetches only the blocks that contain matches and replays the
  reference's greedy consume over the gathered pairs.  This is the
  multi-chip backend behind ``search(..., backend="ring")`` — it
  produces groups identical to the single-chip paths.
"""

from __future__ import annotations

import functools

import numpy as np

from ..definitions import (
    HASH_BITS,
    HASH_BITS_PADDED,
    SELF_SEARCH_DURATION_FACTOR,
)


def _unpack_pm1_jnp(packed):
    import jax.numpy as jnp

    k = packed.shape[0]
    shifts = jnp.arange(32, dtype=jnp.uint32)[None, None, :]
    bits = (packed[:, :, None] >> shifts) & jnp.uint32(1)
    pm = bits.astype(jnp.int8).reshape(k, HASH_BITS_PADDED) * 2 - 1
    return pm.astype(jnp.bfloat16)  # all 1024 storage bits count


@functools.cache
def _build_ring_scan(axis: str):
    import jax
    import jax.numpy as jnp
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    def ring_body(packed_local, durs_local, ids_local, tol):
        """Runs per-shard inside shard_map.

        packed_local: uint32[Ns, 32]; durs_local/ids_local: int32[Ns, 1].
        Returns per-row (count, best_dist, best_idx) over ALL columns.
        """
        n_dev = jax.lax.psum(1, axis)
        pm_local = _unpack_pm1_jnp(packed_local)  # [Ns, 1024] bf16

        # duration window threshold per local row (trunc, as the reference)
        thresh = (
            durs_local.astype(jnp.float32) * SELF_SEARCH_DURATION_FACTOR
        ).astype(jnp.int32)

        def step(s, carry):
            counts, best_dist, best_idx, blk_pm, blk_durs, blk_ids = carry
            dot = jax.lax.dot_general(
                pm_local, blk_pm,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dist = ((HASH_BITS_PADDED - dot) * 0.5).astype(jnp.int32)
            valid = (
                (blk_ids[:, 0][None, :] > ids_local)
                & (blk_durs[:, 0][None, :] <= thresh)
                & (dist <= tol)
            )
            counts = counts + jnp.sum(valid, axis=1, dtype=jnp.int32)[:, None]
            masked = jnp.where(valid, dist, HASH_BITS + 1)
            blk_best = jnp.min(masked, axis=1)
            blk_arg = jnp.take(
                blk_ids[:, 0], jnp.argmin(masked, axis=1), axis=0
            )
            better = blk_best[:, None] < best_dist
            best_idx = jnp.where(better, blk_arg[:, None], best_idx)
            best_dist = jnp.minimum(best_dist, blk_best[:, None])
            # rotate the column block to the next chip on the ring
            perm = [(d, (d + 1) % n_dev) for d in range(n_dev)]
            blk_pm = jax.lax.ppermute(blk_pm, axis, perm)
            blk_durs = jax.lax.ppermute(blk_durs, axis, perm)
            blk_ids = jax.lax.ppermute(blk_ids, axis, perm)
            return (counts, best_dist, best_idx, blk_pm, blk_durs, blk_ids)

        ns = pm_local.shape[0]
        # constants must be marked device-varying for the shard_map carry
        pvary = lambda x: jax.lax.pcast(x, (axis,), to="varying")  # noqa: E731
        init = (
            pvary(jnp.zeros((ns, 1), jnp.int32)),
            pvary(jnp.full((ns, 1), HASH_BITS + 1, jnp.int32)),
            pvary(jnp.full((ns, 1), -1, jnp.int32)),
            pm_local,
            durs_local,
            ids_local,
        )
        counts, best_dist, best_idx, *_ = jax.lax.fori_loop(
            0, n_dev, step, init
        )
        return counts, best_dist, best_idx

    def make(mesh):
        return shard_map(
            ring_body,
            mesh=mesh,
            in_specs=(P(axis, None), P(axis, None), P(axis, None), P()),
            out_specs=(P(axis, None), P(axis, None), P(axis, None)),
        )

    return make


@functools.cache
def _jitted_ring_scan(axis: str, mesh):
    """jit-wrapped ring scan cached per (axis, mesh): a fresh shard_map +
    jit per call retraced every invocation (compiles through the remote
    helper cost ~7.5 s/kernel when the disk cache misses)."""
    import jax

    return jax.jit(_build_ring_scan(axis)(mesh))


def ring_candidate_scan(
    mesh,
    packed: np.ndarray,
    durations: np.ndarray,
    tolerance_int: int,
    axis: str = "x",
):
    """All-pairs duplicate-candidate scan sharded over ``mesh``.

    ``packed`` must be sorted by duration (the Search order).  Returns
    (counts, best_dist, best_idx) per row, where candidates j satisfy
    j > i and dur_j <= int(1.1 * dur_i) and hamming <= tolerance (the
    search_self window, search_algorithm.rs:93-117).
    """
    import jax
    import jax.numpy as jnp

    n = packed.shape[0]
    n_dev = mesh.devices.size
    ns = -(-n // n_dev) * n_dev

    packed_pad = np.zeros((ns, packed.shape[1]), np.uint32)
    packed_pad[:n] = packed
    durs = np.full((ns, 1), -(10**9), np.int32)
    durs[:n, 0] = durations
    # pad COLUMN id must fail the `cand_id > row_id` test for every real
    # row, so it must sit BELOW all ids: -1 (a high sentinel passed the
    # id and duration tests, leaving only the distance test — which an
    # all-zero pad hash can pass against low-popcount rows)
    ids = np.full((ns, 1), -1, np.int32)
    ids[:n, 0] = np.arange(n)

    fn = _jitted_ring_scan(axis, mesh)
    with mesh:
        counts, best_dist, best_idx = fn(
            jnp.asarray(packed_pad),
            jnp.asarray(durs),
            jnp.asarray(ids),
            jnp.int32(tolerance_int),
        )
    return (
        np.asarray(counts)[:n, 0],
        np.asarray(best_dist)[:n, 0],
        np.asarray(best_idx)[:n, 0],
    )


@functools.cache
def _build_ring_pair_step(axis: str):
    """Sharded primitives for the exact-pair ring scan.

    Returns (make_unpack, make_step): ``make_unpack(mesh)`` unpacks the
    sharded packed matrix to +/-1 bf16 rows once; ``make_step(mesh)`` runs
    ONE ring rotation — every shard computes its [Ns, Ns] distance tile
    against the column block currently parked on it, masks with the
    duration-band bounds, bit-packs the adjacency (32 pairs/word), and
    ppermutes the column block to the next shard.  Host drives the n_dev
    steps so each step's adjacency block can be fetched (count-gated) and
    freed — per-shard live memory is O(Ns^2/32) words, not O(Ns * N).
    """
    import jax
    import jax.numpy as jnp
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    def unpack_body(packed_local):
        return _unpack_pm1_jnp(packed_local)

    def step_body(pm_local, blk_pm, bounds_local, s, tol):
        """One rotation step on each shard.

        pm_local: bf16[Ns, 1024] (this shard's rows, fixed);
        blk_pm: bf16[Ns, 1024] (the column block parked here at step s);
        bounds_local: int32[Ns, 1] global column bound per row;
        s, tol: int32 scalars (s is traced: one compile serves all steps).
        Returns (packed_adj uint32[Ns, Ns//32], count int32[1, 1], blk_next).
        """
        n_dev = jax.lax.psum(1, axis)
        d = jax.lax.axis_index(axis)
        ns = pm_local.shape[0]
        row_ids = d * ns + jax.lax.broadcasted_iota(jnp.int32, (ns, 1), 0)
        # after s forward rotations, shard d holds the block born on
        # shard (d - s) mod n_dev
        owner = jnp.mod(d - s, n_dev)
        col_ids = owner * ns + jax.lax.broadcasted_iota(
            jnp.int32, (1, ns), 1
        )
        dot = jax.lax.dot_general(
            pm_local, blk_pm,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dist = ((HASH_BITS_PADDED - dot) * 0.5).astype(jnp.int32)
        valid = (
            (col_ids > row_ids)
            & (col_ids < bounds_local)
            & (dist <= tol)
        )
        weights = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))[
            None, None, :
        ]
        packed_adj = jnp.sum(
            valid.reshape(ns, ns // 32, 32).astype(jnp.uint32) * weights,
            axis=-1,
            dtype=jnp.uint32,
        )
        count = jnp.sum(valid, dtype=jnp.int32).reshape(1, 1)
        perm = [(t, (t + 1) % n_dev) for t in range(n_dev)]
        blk_next = jax.lax.ppermute(blk_pm, axis, perm)
        return packed_adj, count, blk_next

    def make_unpack(mesh):
        return shard_map(
            unpack_body,
            mesh=mesh,
            in_specs=(P(axis, None),),
            out_specs=P(axis, None),
        )

    def make_step(mesh):
        return shard_map(
            step_body,
            mesh=mesh,
            in_specs=(P(axis, None), P(axis, None), P(axis, None), P(), P()),
            out_specs=(P(axis, None), P(axis, None), P(axis, None)),
        )

    return make_unpack, make_step


@functools.cache
def _jitted_ring_pair_fns(axis: str, mesh):
    """jit-wrapped exact-pair ring primitives cached per (axis, mesh)."""
    import jax

    make_unpack, make_step = _build_ring_pair_step(axis)
    return jax.jit(make_unpack(mesh)), jax.jit(make_step(mesh))


def banded_adjacency_ring(
    packed: np.ndarray,
    bounds: np.ndarray,
    tolerance_int: int,
    mesh=None,
    axis: str = "x",
    inflight: int = 4,
) -> tuple[np.ndarray, np.ndarray]:
    """Exact banded adjacency over a device mesh (ring ppermute scan).

    Same contract as ``ops.hamming.banded_adjacency``: all pairs (i, j)
    with i < j < bounds[i] and hamming(i, j) <= tolerance_int, in
    lexicographic order — so the host greedy replay produces groups
    identical to the single-chip backends
    (search_algorithm.rs:81-171 semantics survive sharding unchanged).

    ``inflight`` bounds how many rotation steps are enqueued ahead of the
    count fetches, capping live adjacency memory at
    inflight * N * Ns / 8 bytes while still pipelining dispatch.
    """
    import jax
    import jax.numpy as jnp

    n = packed.shape[0]
    if n == 0:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    if mesh is None:
        from .mesh import make_mesh

        mesh = make_mesh(axis=axis)

    n_dev = int(mesh.devices.size)
    # per-shard rows: multiple of 256 so the bitpack reshape and TPU lane
    # tiling both line up
    ns = -(-n // n_dev)
    ns = -(-ns // 256) * 256
    npad = ns * n_dev

    packed_pad = np.zeros((npad, packed.shape[1]), np.uint32)
    packed_pad[:n] = packed
    bounds_np = np.zeros((npad, 1), np.int32)  # pad rows match nothing
    bounds_np[:n, 0] = np.minimum(np.asarray(bounds, dtype=np.int64), n)

    unpack_fn, step_fn = _jitted_ring_pair_fns(axis, mesh)

    out_i: list[np.ndarray] = []
    out_j: list[np.ndarray] = []
    shifts = np.arange(32, dtype=np.uint32)[None, None, :]

    def drain(entry) -> None:
        s, adj, counts = entry
        counts_np = np.asarray(counts)[:, 0]  # [n_dev]
        for d in np.flatnonzero(counts_np > 0):
            d = int(d)
            block = np.asarray(adj[d * ns : (d + 1) * ns])  # [ns, ns//32]
            owner = (d - s) % n_dev
            bits = ((block[:, :, None] >> shifts) & 1).reshape(
                ns, ns
            ).astype(bool)
            rr, cc = np.nonzero(bits)
            out_i.append(d * ns + rr.astype(np.int64))
            out_j.append(owner * ns + cc.astype(np.int64))

    with mesh:
        pm = unpack_fn(jnp.asarray(packed_pad))
        blk = pm
        bounds_dev = jnp.asarray(bounds_np)
        pending: list[tuple[int, object, object]] = []
        for s in range(n_dev):
            adj, counts, blk = step_fn(
                pm, blk, bounds_dev, jnp.int32(s), jnp.int32(tolerance_int)
            )
            pending.append((s, adj, counts))
            if len(pending) >= inflight:
                drain(pending.pop(0))
        while pending:
            drain(pending.pop(0))

    if not out_i:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    ii = np.concatenate(out_i)
    jj = np.concatenate(out_j)
    order = np.lexsort((jj, ii))
    return ii[order], jj[order]


@functools.cache
def _build_sharded_hash(axis: str):
    import jax
    import jax.numpy as jnp
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from ..definitions import DCT_SIZE, HASH_SIZE
    from ..ops.golden import dct2_matrix

    dct_np = dct2_matrix(DCT_SIZE, np.float32)

    def hash_shard(cubes):
        """uint8[Bs, 16, 16, 16] -> uint32[Bs, 32] on each chip."""
        hi = jax.lax.Precision.HIGHEST  # match hash_kernel/hash_pallas bits
        dct = jnp.asarray(dct_np)
        x = cubes.astype(jnp.float32).transpose(0, 1, 3, 2) - 128.0
        x = jnp.einsum("ky,btxy->btxk", dct, x, precision=hi)
        x = jnp.einsum("jx,btxk->btjk", dct, x, precision=hi)
        x = jnp.einsum("it,btjk->bijk", dct, x, precision=hi)
        corner = x[:, :HASH_SIZE, :HASH_SIZE, :HASH_SIZE]
        bits = (corner > 0.0).reshape(cubes.shape[0], HASH_SIZE**3)
        padded = jnp.pad(bits, ((0, 0), (0, HASH_BITS_PADDED - HASH_SIZE**3)))
        weights = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))[
            None, None, :
        ]
        return jnp.sum(
            padded.reshape(
                cubes.shape[0], HASH_BITS_PADDED // 32, 32
            ).astype(jnp.uint32)
            * weights,
            axis=-1,
            dtype=jnp.uint32,
        )

    def make(mesh):
        return shard_map(
            hash_shard,
            mesh=mesh,
            in_specs=(P(axis, None, None, None),),
            out_specs=P(axis, None),
        )

    return make


@functools.cache
def _jitted_sharded_hash(axis: str, mesh):
    import jax

    return jax.jit(_build_sharded_hash(axis)(mesh))


def sharded_hash_batch(mesh, cubes: np.ndarray, axis: str = "x") -> np.ndarray:
    """Data-parallel batched hashing over the mesh: each chip hashes its
    shard of the video batch (uint8[B, 16, 16, 16] -> uint32[B, 32])."""
    import jax.numpy as jnp

    b = cubes.shape[0]
    n_dev = mesh.devices.size
    b_pad = -(-b // n_dev) * n_dev
    if b_pad != b:
        cubes = np.concatenate(
            [cubes, np.zeros((b_pad - b,) + cubes.shape[1:], np.uint8)]
        )
    fn = _jitted_sharded_hash(axis, mesh)
    with mesh:
        out = fn(jnp.asarray(cubes))
    return np.asarray(out)[:b]
