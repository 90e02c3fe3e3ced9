"""Pallas TPU kernel v2: whole-band sweep in one launch.

One launch processes one row tile against its ENTIRE duration band (up to
MAX_BAND column tiles) with an in-kernel ``fori_loop`` and manually
double-buffered HBM->VMEM DMA of the column tiles:

    for t in range(n_tiles):             # runtime bound
        start DMA for tile t+1           # overlap with compute
        wait DMA for tile t
        MXU ±1 matmul -> mask -> bitpack -> DMA the packed tile out

Compared to the grid-pipelined kernel (``hamming_pallas.py``), this removes
the per-grid-step machinery (~tens of us/tile there) and makes compile time
independent of the band width (the loop is a runtime ``while``, not grid
steps — grid steps cost ~7.5 s each through the remote compile helper).

Used by ``bench.py``/``search`` via backend="band"; parity-tested against
the host backend like every other path.
"""

from __future__ import annotations

import functools

import numpy as np

from ..definitions import HASH_BITS_PADDED
from .hamming_pallas import (
    PM_DTYPE,
    PallasSearchState,
    TILE_M,
    TILE_N,
    _pack_matrices,
    _tile_bits_to_pairs,
)

MAX_BAND = 128  # column tiles (128 x 1024 = 131k columns) per launch


def _is_tpu() -> bool:
    import jax

    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


@functools.cache
def _build_band(interpret: bool):
    """scalars (int32[5]): [tol, n, row_tile, first_col_tile, n_tiles]."""
    from ..utils.jaxconfig import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(scal_ref, rows_ref, bounds_ref, pow_lo_ref, pow_hi_ref,
               pm1_hbm, out_hbm, count_ref, cols_vmem, packed_vmem,
               in_sems, out_sems):
        tol = scal_ref[0]
        n = scal_ref[1]
        r0 = scal_ref[2] * TILE_M
        ct0 = scal_ref[3]
        n_tiles = scal_ref[4]

        a = rows_ref[...]  # [TILE_M, 1024] bf16
        pow_lo = pow_lo_ref[...]
        pow_hi = pow_hi_ref[...]
        bounds = bounds_ref[...]
        col_limit = jnp.minimum(bounds, n)
        row_ids = r0 + jax.lax.broadcasted_iota(jnp.int32, (TILE_M, 1), 0)
        # int8 operands accumulate exactly in int32 on the MXU (bf16 in
        # f32) — a forced f32 preferred type on int8 inputs would
        # abandon the int8 MXU fast path (see hamming_pallas._build_chunk)
        acc = jnp.int32 if PM_DTYPE == "int8" else jnp.float32
        dot_thresh = (HASH_BITS_PADDED - 2 * tol).astype(acc)

        # zero all counts first (stale slots beyond n_tiles must read 0)
        def zero_body(t, _):
            count_ref[t, 0] = 0
            return 0

        jax.lax.fori_loop(0, MAX_BAND, zero_body, 0)

        def col_dma(slot, t):
            return pltpu.make_async_copy(
                pm1_hbm.at[pl.ds((ct0 + t) * TILE_N, TILE_N), :],
                cols_vmem.at[slot],
                in_sems.at[slot],
            )

        def out_dma(slot, t):
            return pltpu.make_async_copy(
                packed_vmem.at[slot],
                out_hbm.at[t],
                out_sems.at[slot],
            )

        col_dma(0, 0).start()

        def body(t, _):
            slot = jax.lax.rem(t, 2)
            nxt = jax.lax.rem(t + 1, 2)

            @pl.when(t + 1 < n_tiles)
            def _():
                col_dma(nxt, t + 1).start()

            col_dma(slot, t).wait()
            b = cols_vmem[slot]

            dot = jax.lax.dot_general(
                a, b,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=acc,
            )
            c0 = (ct0 + t) * TILE_N
            col_ids = c0 + jax.lax.broadcasted_iota(
                jnp.int32, (1, TILE_N), 1
            )
            adj = (
                (dot >= dot_thresh)
                & (col_ids > row_ids)
                & (col_ids < col_limit)
                & (row_ids < n)
            )
            count_ref[t, 0] = jnp.sum(adj.astype(jnp.int32))

            adj_f = adj.astype(jnp.float32)
            dims = (((1,), (0,)), ((), ()))
            lo = jnp.round(
                jax.lax.dot_general(
                    pow_lo, adj_f, dims,
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )
            ).astype(jnp.int32)
            hi = jnp.round(
                jax.lax.dot_general(
                    pow_hi, adj_f, dims,
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )
            ).astype(jnp.int32)

            # reuse of the packed slot: wait for its previous write-out
            @pl.when(t >= 2)
            def _():
                out_dma(slot, t - 2).wait()

            packed_vmem[slot] = lo | (hi << 16)
            out_dma(slot, t).start()
            return 0

        jax.lax.fori_loop(0, n_tiles, body, 0)

        # drain outstanding write-outs
        @pl.when(n_tiles >= 2)
        def _():
            out_dma(jax.lax.rem(n_tiles - 2, 2), n_tiles - 2).wait()

        @pl.when(n_tiles >= 1)
        def _():
            out_dma(jax.lax.rem(n_tiles - 1, 2), n_tiles - 1).wait()

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(
                (TILE_M, HASH_BITS_PADDED),
                lambda i, s: (s[2], 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (TILE_M, 1),
                lambda i, s: (s[2], 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (TILE_M // 32, TILE_M),
                lambda i, s: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (TILE_M // 32, TILE_M),
                lambda i, s: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pl.ANY),  # pm1, DMA'd manually
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),  # packed tiles (HBM)
            pl.BlockSpec(
                (MAX_BAND, 1), lambda i, s: (0, 0),
                memory_space=pltpu.SMEM,
            ),
        ),
        scratch_shapes=[
            pltpu.VMEM(
                (2, TILE_N, HASH_BITS_PADDED),
                jnp.int8 if PM_DTYPE == "int8" else jnp.bfloat16,
            ),
            pltpu.VMEM((2, TILE_M // 32, TILE_N), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    pow_lo_np, pow_hi_np = _pack_matrices(TILE_M)

    def one_launch(scalars, pm1_rows, bounds, pm1_full):
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=(
                jax.ShapeDtypeStruct(
                    (MAX_BAND, TILE_M // 32, TILE_N), jnp.int32
                ),
                jax.ShapeDtypeStruct((MAX_BAND, 1), jnp.int32),
            ),
            interpret=interpret,
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(
            scalars, pm1_rows, bounds,
            jnp.asarray(pow_lo_np), jnp.asarray(pow_hi_np), pm1_full,
        )

    return jax.jit(one_launch)


@functools.cache
def _stack_jit():
    import jax
    import jax.numpy as jnp

    @jax.jit
    def stack_of(*cs):
        return jnp.stack(cs)

    return stack_of


def banded_adjacency_band(
    packed: np.ndarray,
    bounds: np.ndarray,
    tolerance_int: int,
    interpret: bool | None = None,
    state: PallasSearchState | None = None,
    window: int = 48,
) -> tuple[np.ndarray, np.ndarray]:
    """Banded adjacency sweep via the whole-band kernel.

    Same contract as the other backends: all pairs (i, j) with
    i < j < bounds[i] and hamming <= tolerance_int, lexicographic order.
    """
    import jax.numpy as jnp

    if interpret is None:
        interpret = not _is_tpu()
    n = packed.shape[0]
    if n == 0:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    bounds = np.asarray(bounds, dtype=np.int64)

    if state is None:
        state = PallasSearchState(packed, bounds)
    fn = _build_band(interpret)
    stack_of = _stack_jit()
    if interpret:
        # interpret-mode emulation of manual DMA is not safe across
        # concurrently in-flight launches; serialize them (tests only)
        window = 1

    n_row_tiles = -(-n // TILE_M)
    launches: list[tuple[int, int, int]] = []
    for rt in range(n_row_tiles):
        ct0 = int(state.first_ct[rt])
        remaining = int(state.n_ct[rt])
        while remaining > 0:
            ntiles = min(remaining, MAX_BAND)
            launches.append((rt, ct0, ntiles))
            ct0 += ntiles
            remaining -= ntiles

    out_i: list[np.ndarray] = []
    out_j: list[np.ndarray] = []
    pending: list = []
    zero_counts = jnp.zeros((MAX_BAND, 1), jnp.int32)

    def drain() -> None:
        nonlocal pending
        if not pending:
            return
        cs = [c for (_, _, _, c) in pending]
        cs += [zero_counts] * (window - len(cs))
        counts_np = np.asarray(stack_of(*cs))[..., 0]
        for k, t in zip(*np.nonzero(counts_np > 0)):
            rt, ct0, packed_out, _ = pending[int(k)]
            roff, coff = _tile_bits_to_pairs(
                np.asarray(packed_out[int(t)])
            )
            out_i.append(roff.astype(np.int64) + rt * TILE_M)
            out_j.append(
                coff.astype(np.int64) + (ct0 + int(t)) * TILE_N
            )
        pending = []

    scal = np.zeros(5, dtype=np.int32)
    for rt, ct0, ntiles in launches:
        scal[:] = (tolerance_int, n, rt, ct0, ntiles)
        packed_out, counts = fn(
            jnp.asarray(scal), state.pm1, state.bounds_dev, state.pm1
        )
        pending.append((rt, ct0, packed_out, counts))
        if len(pending) >= window:
            drain()
    drain()

    if not out_i:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    ii = np.concatenate(out_i)
    jj = np.concatenate(out_j)
    order = np.lexsort((jj, ii))
    return ii[order], jj[order]
