"""Pallas kernel: shift-table filter convolution (photometry numerator).

The XLA fast path in `sed.py::_photometry_one` materializes two (B, F, L)
gathered table slices in HBM (~1 GB per 8k batch) before the reduction.
Mosaic only allows lane-dimension dynamic slices at 128-aligned offsets, so
this kernel uses a pre-rolled table bank: the real-valued column shift
s(z) = log10(1+z)/Δ is snapped to 1/8 columns (λ error ≤ Δ/16 ≈ 0.007%,
band-edge photometry error ≲ 0.1%, far below the photometric noise floor)
and decomposed

    s ≈ m + rs/8,   m = 128·q + r,   r ∈ [0,128), rs ∈ {0..7}

`build_shift_tables` precomputes the 1024 (rs, r) pre-rolled copies once
(host side, ~90 MB in HBM); per galaxy the kernel issues ONE aligned
(F8, L) DMA from the bank (double-buffered across galaxies) and a fused
VPU multiply-reduce against the flux row. HBM traffic drops from ~1 GB to
~0.5 GB per 8k batch with no gather ops.

Denominators Σ_l w_l T_f(λ_l(1+z)) depend only on the snapped shift and are
precomputed exactly per quarter-column shift (`build_den_table`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "build_shift_tables",
    "build_den_table",
    "shift_decompose",
    "pallas_photometry_num",
]

N_SUB = 8  # sub-column shift resolution (1/8 column)
N_ROLL = 128  # lane-alignment residuals


def build_shift_tables(filter_set, lam_rest: np.ndarray, dlog: float,
                       max_shift: int, n_wav: int):
    """(512, F8, Ltp) bank: bank[r4*128+r, f, j] = T_f(λ0·10^{(j+r+r4/4)Δ}).

    Lookup with lane offset 128·q then column l yields the transmission at
    total shift l + 128q + r + r4/4.
    """
    f = len(filter_set)
    f8 = int(np.ceil(f / 8) * 8)
    q_max = (max_shift - 1) // N_ROLL + 1
    ltp = int(np.ceil((n_wav + N_ROLL * q_max) / N_ROLL) * N_ROLL)
    lam0 = float(lam_rest[0])
    bank = np.zeros((N_SUB * N_ROLL, f8, ltp), dtype=np.float32)
    # the r rolls of one sub-shift are windows of a single longer evaluation
    j_ext = np.arange(ltp + N_ROLL)
    for rs in range(N_SUB):
        lam_eval = lam0 * 10.0 ** ((j_ext + rs / N_SUB) * dlog)
        for fi, filt in enumerate(filter_set.filters):
            t_ext = np.interp(lam_eval, filt.lam, filt.transmission,
                              left=0.0, right=0.0).astype(np.float32)
            windows = np.lib.stride_tricks.sliding_window_view(
                t_ext, ltp
            )[:N_ROLL]
            bank[rs * N_ROLL : (rs + 1) * N_ROLL, fi] = windows
    return bank, q_max


def build_den_table(filter_set, lam_rest: np.ndarray, wlam: np.ndarray,
                    dlog: float, max_shift: int):
    """(4·max_shift+4, F) exact denominators per quarter-column shift s4:
    den[s4, f] = Σ_l w_l T_f(λ0·10^{(l + s4/4)Δ})."""
    f = len(filter_set)
    n_wav = len(lam_rest)
    n_s4 = N_SUB * max_shift + N_SUB
    n_m = max_shift + 2  # integer part of the shift
    lam0 = float(lam_rest[0])
    den = np.zeros((n_s4, f), dtype=np.float32)
    w = np.asarray(wlam, dtype=np.float64)
    j_ext = np.arange(n_wav + n_m)
    for rs in range(N_SUB):
        lam_eval = lam0 * 10.0 ** ((j_ext + rs / N_SUB) * dlog)
        for fi, filt in enumerate(filter_set.filters):
            t_ext = np.interp(lam_eval, filt.lam, filt.transmission,
                              left=0.0, right=0.0)
            # den for shift m + rs/N_SUB = sliding dot of t_ext with w
            wins = np.lib.stride_tricks.sliding_window_view(t_ext, n_wav)
            vals = wins[: (n_s4 - rs) // N_SUB + 1] @ w
            den[rs::N_SUB, fi] = vals[: len(den[rs::N_SUB, fi])]
    return den


def shift_decompose(s, max_shift: int):
    """Real shift -> (s4 snapped index, table id, aligned lane offset)."""
    s4 = jnp.clip(
        jnp.round(s * N_SUB).astype(jnp.int32), 0, N_SUB * max_shift - 1
    )
    m = s4 // N_SUB
    r4 = s4 % N_SUB
    q, r = m // N_ROLL, m % N_ROLL
    tid = r4 * N_ROLL + r
    off = q * N_ROLL
    return s4, tid, off


def _num_kernel(tid_ref, off_ref, fnu_ref, bank_ref, out_ref, scratch, sems):
    bb = fnu_ref.shape[0]
    n_l = fnu_ref.shape[1]
    blk = pl.program_id(0)

    def get_dma(slot, b):
        tid = tid_ref[blk * bb + b]
        off = pl.multiple_of(off_ref[blk * bb + b], N_ROLL)
        return pltpu.make_async_copy(
            bank_ref.at[tid, :, pl.ds(off, n_l)],
            scratch.at[slot],
            sems.at[slot],
        )

    get_dma(0, 0).start()

    def body(b, _):
        slot = jax.lax.rem(b, 2)
        nxt = jax.lax.rem(b + 1, 2)

        @pl.when(b + 1 < bb)
        def _():
            get_dma(nxt, b + 1).start()

        get_dma(slot, b).wait()
        t = scratch[slot]  # (F8, L)
        row = fnu_ref[b, :]
        out_ref[b, :] = jnp.sum(t * row[None, :], axis=1)
        return 0

    jax.lax.fori_loop(0, bb, body, 0)


@functools.partial(jax.jit, static_argnames=("block_b",))
def pallas_photometry_num(fnu_w, bank, tids, offs, block_b: int = 256):
    """Numerators Σ_l fnu_w[b,l] · T_f at each galaxy's snapped shift.

    Args:
        fnu_w: (B, L) flux × dλ/λ weights, B a multiple of block_b.
        bank: (512, F8, Ltp) from build_shift_tables (HBM-resident).
        tids/offs: (B,) int32 from shift_decompose.
    Returns:
        (B, F8) numerators.
    """
    b, n_l = fnu_w.shape
    _, f8, _ = bank.shape
    grid = (b // block_b,)
    return pl.pallas_call(
        _num_kernel,
        out_shape=jax.ShapeDtypeStruct((b, f8), jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,  # tids, offs
            grid=grid,
            in_specs=[
                pl.BlockSpec((block_b, n_l), lambda i, *_: (i, 0)),
                pl.BlockSpec(memory_space=pltpu.ANY),  # bank stays in HBM
            ],
            out_specs=pl.BlockSpec((block_b, f8), lambda i, *_: (i, 0)),
            scratch_shapes=[
                pltpu.VMEM((2, f8, n_l), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
    )(tids, offs, fnu_w, bank)
