"""Filter-convolution photometry: knot-matmul fast path + Pallas kernels.

Three TPU variants, fastest first:

1. "interp" (default): evaluate the numerator at K integer-column shift
   knots with ONE MXU matmul (B, L) @ (L, K·F8) and lerp each galaxy's real
   shift — no per-galaxy loop at all. ~8x faster than the loop kernels at
   65k batches; accuracy ≲0.05% median / 0.5% tail at δ=4 PROVIDED the
   denominator is interpolated at the same knots (see
   `interp_photometry_den`).
2. "bank": exact to 1/8 column; pre-rolled lane residuals + per-galaxy
   double-buffered DMA. Loop-latency-bound (~300 ns/galaxy).
3. "roll": exact, compact VMEM table + dynamic lane rotate; any grid size.

Original design notes for the exact kernels follow.


The XLA fast path in `sed.py::_photometry_one` materializes two (B, F, L)
gathered table slices in HBM (~1 GB per 8k batch) before the reduction.
Mosaic only allows lane-dimension dynamic slices at 128-aligned offsets, so
arbitrary per-galaxy table shifts can't be sliced directly. Instead of
slicing the TABLE, this kernel rolls the FLUX ROW:

    num_f = Σ_l T_f[l + m] · fw[l]  =  Σ_j T_f[j] · roll(fw, m)[j]

with the real-valued column shift s(z) = log10(1+z)/Δ snapped to 1/8
columns (λ error ≤ Δ/16, band-edge photometry error ≲ 0.1% at production
grid resolution) and decomposed s ≈ m + rs/8. The table holds only the 8
sub-column variants — (8, F8, Ltp) ≈ 3 MB — and stays VMEM-RESIDENT; the
per-galaxy work is one `pltpu.roll` (dynamic lane rotate) plus a fused VPU
multiply-reduce. No HBM DMA inside the loop at all.

(The round-1 design pre-rolled 128 lane-residual copies of the table into a
~90 MB HBM bank and DMA'd an (F8, L) slab per galaxy; at realistic grid
sizes (10⁴ λ) the bank reached 436 MB, blowing the axon tunnel's compile
request limit and costing B × 320 KB of HBM reads per batch. The roll
design removes the bank, the DMA traffic, and the compile-size failure in
one move.)

Denominators Σ_l w_l T_f(λ_l(1+z)) depend only on the snapped shift and are
precomputed exactly per 1/8-column shift (`build_den_table`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "build_subshift_table",
    "build_subshift_table_device",
    "build_shift_bank_device",
    "build_den_table",
    "shift_decompose",
    "bank_decompose",
    "bank_nbytes",
    "pallas_photometry_num",
    "pallas_photometry_num_bank",
    "pick_block_b",
]

N_SUB = 8  # sub-column shift resolution (1/8 column)
_LANE = 128
N_ROLL = _LANE  # lane-alignment residuals pre-rolled into the bank variant


def _table_ltp(n_wav: int, max_shift: int) -> int:
    """Padded table length: must cover j = l + m for l < n_wav, m <= max_shift,
    rounded to the 128-lane tile so rolls and reductions stay aligned."""
    return int(np.ceil((n_wav + max_shift + 1) / _LANE) * _LANE)


def build_subshift_table(filter_set, lam_rest, dlog: float, max_shift: int,
                         n_wav: int) -> np.ndarray:
    """(N_SUB, F8, Ltp) host-numpy reference table:
    table[rs, f, j] = T_f(λ0 · 10^{(j + rs/8) Δ})."""
    f = len(filter_set)
    f8 = int(np.ceil(f / 8) * 8)
    ltp = _table_ltp(n_wav, max_shift)
    lam0 = float(lam_rest[0])
    j = np.arange(ltp)
    table = np.zeros((N_SUB, f8, ltp), dtype=np.float32)
    for rs in range(N_SUB):
        lam_eval = lam0 * 10.0 ** ((j + rs / N_SUB) * dlog)
        for fi, filt in enumerate(filter_set.filters):
            table[rs, fi] = np.interp(
                lam_eval, filt.lam, filt.transmission, left=0.0, right=0.0
            ).astype(np.float32)
    return table


@functools.partial(jax.jit, static_argnames=("ltp", "f8"))
def _table_on_device(filt_lam, filt_tr, lam0, dlog, ltp: int, f8: int):
    """Jitted table construction: only the (F, K) padded filter curves (a
    few KB) cross the host->device link."""
    j = jnp.arange(ltp, dtype=jnp.float32)

    def one_rs(rs):
        lam_eval = lam0 * 10.0 ** ((j + rs / N_SUB) * dlog)

        def one_filter(fl, ft):
            return jnp.interp(lam_eval, fl, ft, left=0.0, right=0.0)

        return jax.vmap(one_filter)(filt_lam, filt_tr)  # (F, ltp)

    table = jax.vmap(one_rs)(jnp.arange(N_SUB, dtype=jnp.float32))
    pad_f = f8 - table.shape[1]
    if pad_f:
        table = jnp.pad(table, ((0, 0), (0, pad_f), (0, 0)))
    return table.astype(jnp.float32)


def build_subshift_table_device(filter_set, lam_rest, dlog: float,
                                max_shift: int, n_wav: int):
    """Device-side `build_subshift_table`. Returns a (N_SUB, F8, Ltp) jnp
    array (~3 MB at 10⁴ λ — small enough to live in VMEM during the
    kernel and to embed as a jit constant without bloating compiles)."""
    f = len(filter_set)
    f8 = int(np.ceil(f / 8) * 8)
    ltp = _table_ltp(n_wav, max_shift)
    lam0 = float(lam_rest[0])
    # pad filter curves to a common length with strictly increasing λ tails
    # (transmission 0 there; jnp.interp right=0 keeps them inert)
    k = max(len(filt.lam) for filt in filter_set.filters)
    filt_lam = np.zeros((f, k), np.float32)
    filt_tr = np.zeros((f, k), np.float32)
    for i, filt in enumerate(filter_set.filters):
        n = len(filt.lam)
        filt_lam[i, :n] = filt.lam
        filt_tr[i, :n] = filt.transmission
        if n < k:
            last = float(filt.lam[-1])
            filt_lam[i, n:] = last * (1.0 + 1.0e-6 * np.arange(1, k - n + 1))
    return _table_on_device(
        jnp.asarray(filt_lam), jnp.asarray(filt_tr),
        jnp.float32(lam0), jnp.float32(dlog), ltp=ltp, f8=f8,
    )


# ---------------------------------------------------------------------------
# Bank variant: pre-rolled lane residuals, per-galaxy DMA (fast path)
# ---------------------------------------------------------------------------
#
# The roll kernel above is compact (≈3 MB table) but pays a dynamic lane
# rotate per galaxy (~19 ms / 65k batch at 2048 λ on v5e). When the full
# (N_SUB·N_ROLL, F8, Ltp) bank fits comfortably in HBM, the round-1 design
# is ~4x faster: pre-roll the 128 lane residuals into the bank so each
# galaxy needs ONE aligned (F8, L) DMA (double-buffered across the loop)
# and a fused VPU multiply-reduce — HBM-bandwidth-bound instead of
# rotate-bound. `sed.py` picks the bank variant whenever
# `bank_nbytes(...)` is small enough to embed in the compile without
# tripping the remote-compile size limit.


def _bank_ltp(n_wav: int, max_shift: int) -> int:
    q_max = (max_shift - 1) // N_ROLL + 1
    return int(np.ceil((n_wav + N_ROLL * q_max) / N_ROLL) * N_ROLL)


def bank_nbytes(n_filters: int, n_wav: int, max_shift: int) -> int:
    """HBM footprint of the pre-rolled bank for this configuration."""
    f8 = int(np.ceil(n_filters / 8) * 8)
    return N_SUB * N_ROLL * f8 * _bank_ltp(n_wav, max_shift) * 4


@functools.partial(jax.jit, static_argnames=("ltp", "f8"))
def _bank_on_device(filt_lam, filt_tr, lam0, dlog, ltp: int, f8: int):
    """Jitted bank construction: bank[rs·128+r, f, j] = T_f at
    λ0·10^{(j+r+rs/8)Δ}; only the filter curves ship host->device."""
    j_ext = jnp.arange(ltp + N_ROLL, dtype=jnp.float32)
    roll_idx = (
        jnp.arange(N_ROLL)[:, None] + jnp.arange(ltp)[None, :]
    )  # (128, ltp) window gather

    def one_rs(rs):
        lam_eval = lam0 * 10.0 ** ((j_ext + rs / N_SUB) * dlog)

        def one_filter(fl, ft):
            t_ext = jnp.interp(lam_eval, fl, ft, left=0.0, right=0.0)
            return t_ext[roll_idx]  # (N_ROLL, ltp)

        return jax.vmap(one_filter)(filt_lam, filt_tr)  # (F, N_ROLL, ltp)

    banks = jax.vmap(one_rs)(
        jnp.arange(N_SUB, dtype=jnp.float32)
    )  # (N_SUB, F, N_ROLL, ltp)
    banks = jnp.moveaxis(banks, 1, 2).reshape(
        N_SUB * N_ROLL, banks.shape[1], ltp
    )
    pad_f = f8 - banks.shape[1]
    if pad_f:
        banks = jnp.pad(banks, ((0, 0), (0, pad_f), (0, 0)))
    return banks.astype(jnp.float32)


def build_shift_bank_device(filter_set, lam_rest, dlog: float,
                            max_shift: int, n_wav: int):
    """Device-side pre-rolled bank (N_SUB·N_ROLL, F8, Ltp)."""
    f = len(filter_set)
    f8 = int(np.ceil(f / 8) * 8)
    ltp = _bank_ltp(n_wav, max_shift)
    lam0 = float(lam_rest[0])
    k = max(len(filt.lam) for filt in filter_set.filters)
    filt_lam = np.zeros((f, k), np.float32)
    filt_tr = np.zeros((f, k), np.float32)
    for i, filt in enumerate(filter_set.filters):
        n = len(filt.lam)
        filt_lam[i, :n] = filt.lam
        filt_tr[i, :n] = filt.transmission
        if n < k:
            last = float(filt.lam[-1])
            filt_lam[i, n:] = last * (1.0 + 1.0e-6 * np.arange(1, k - n + 1))
    return _bank_on_device(
        jnp.asarray(filt_lam), jnp.asarray(filt_tr),
        jnp.float32(lam0), jnp.float32(dlog), ltp=ltp, f8=f8,
    )


def bank_decompose(s4):
    """Snapped shift index -> (bank row id, 128-aligned lane offset):
    m = s4 // 8 = 128·q + r, rs = s4 % 8; tid = rs·128 + r, off = 128·q."""
    m = s4 // N_SUB
    rs = s4 % N_SUB
    q, r = m // N_ROLL, m % N_ROLL
    return rs * N_ROLL + r, q * N_ROLL


def _num_kernel_bank(tid_ref, off_ref, fnu_ref, bank_ref, out_ref, scratch,
                     sems):
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
def pallas_photometry_num_bank(fnu_w, bank, tids, offs, block_b: int = 256):
    """Bank-variant numerators: one double-buffered (F8, L) DMA per galaxy.

    Args:
        fnu_w: (B, L) flux × dλ/λ weights, B a multiple of block_b.
        bank: (N_SUB·N_ROLL, F8, Ltp) from build_shift_bank_device
            (HBM-resident).
        tids/offs: (B,) int32 from bank_decompose.
    Returns:
        (B, F8) numerators.
    """
    b, n_l = fnu_w.shape
    _, f8, _ = bank.shape
    grid = (b // block_b,)
    return pl.pallas_call(
        _num_kernel_bank,
        out_shape=jax.ShapeDtypeStruct((b, f8), jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,  # tids, offs
            grid=grid,
            in_specs=[
                pl.BlockSpec((block_b, n_l), lambda i, *_: (i, 0)),
                pl.BlockSpec(memory_space=pl.ANY),  # bank stays in HBM
            ],
            out_specs=pl.BlockSpec((block_b, f8), lambda i, *_: (i, 0)),
            scratch_shapes=[
                pltpu.VMEM((2, f8, n_l), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
    )(tids, offs, fnu_w, bank)


def build_den_table(filter_set, lam_rest: np.ndarray, wlam: np.ndarray,
                    dlog: float, max_shift: int):
    """(N_SUB·max_shift + N_SUB, F) exact denominators per 1/8-column shift:
    den[s4, f] = Σ_l w_l T_f(λ0·10^{(l + s4/8)Δ})."""
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
    """Real column shift -> snapped 1/8-column index s4 (int32).
    m = s4 // N_SUB is the integer roll; rs = s4 % N_SUB the table row."""
    return jnp.clip(
        jnp.round(s * N_SUB).astype(jnp.int32), 0, N_SUB * max_shift - 1
    )


def pick_block_b(batch: int, ltp: int, vmem_budget: int = 8 << 20) -> int:
    """Largest power-of-two galaxy block whose flux slab fits the VMEM
    budget (the table adds ~N_SUB·F8·ltp·4 on top)."""
    block = 256
    while block > 8 and block * ltp * 4 > vmem_budget:
        block //= 2
    return max(block, 8)


def _num_kernel(s4_ref, fnu_ref, table_ref, out_ref):
    bb = fnu_ref.shape[0]
    blk = pl.program_id(0)

    def body(b, _):
        s4 = s4_ref[blk * bb + b]
        m = s4 // N_SUB
        rs = s4 % N_SUB
        fw = fnu_ref[pl.ds(b, 1), :]  # (1, Ltp)
        # roll right by m: fw_roll[j] = fw[j - m]; the λ-pad region is zero
        # and Ltp - n_wav >= max_shift, so wrapped entries are zeros
        fw_roll = pltpu.roll(fw, m, axis=1)
        t = table_ref[rs]  # (F8, Ltp) — all VMEM, no DMA
        out_ref[pl.ds(b, 1), :] = jnp.sum(t * fw_roll, axis=1)[None, :]
        return 0

    jax.lax.fori_loop(0, bb, body, 0)


@functools.partial(jax.jit, static_argnames=("block_b",))
def pallas_photometry_num(fnu_w, table, s4, block_b: int = 256):
    """Numerators Σ_l fnu_w[b,l] · T_f at each galaxy's snapped shift.

    Args:
        fnu_w: (B, L) flux × dλ/λ weights, B a multiple of block_b.
        table: (N_SUB, F8, Ltp) from build_subshift_table[_device].
        s4: (B,) int32 snapped shifts from shift_decompose.
    Returns:
        (B, F8) numerators.
    """
    b, n_l = fnu_w.shape
    n_sub, f8, ltp = table.shape
    fnu_pad = jnp.pad(fnu_w, ((0, 0), (0, ltp - n_l)))
    grid = (b // block_b,)
    return pl.pallas_call(
        _num_kernel,
        out_shape=jax.ShapeDtypeStruct((b, f8), jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,  # s4
            grid=grid,
            in_specs=[
                pl.BlockSpec((block_b, ltp), lambda i, *_: (i, 0)),
                pl.BlockSpec((n_sub, f8, ltp), lambda i, *_: (0, 0, 0)),
            ],
            out_specs=pl.BlockSpec((block_b, f8), lambda i, *_: (i, 0)),
        ),
    )(s4, fnu_pad, table)


# ---------------------------------------------------------------------------
# Interp-matmul variant: knot-table MXU contraction + shift-space lerp
# ---------------------------------------------------------------------------
#
# Both kernels above loop galaxies sequentially inside Pallas; at 65k-galaxy
# batches the ~300 ns/iteration loop latency dominates (~19 ms — far above
# the ~1 ms speed-of-light of the data movement). This variant removes the
# per-galaxy loop entirely:
#
#   num(b, f; s) = Σ_l fw[b,l] · T_f(λ0·10^{(l+s)Δ})   is smooth in s, so
#   evaluate it at K integer-column knots s = k·δ with ONE MXU matmul
#   (B, L) @ (L, K·F8) and linearly interpolate each galaxy's real shift
#   between its two bracketing knots (a cheap per-row gather + lerp).
#
# Accuracy: the interpolation error is O((δ/W)²) with W the filter width in
# columns (W ≈ hundreds); δ = 8 keeps broadband photometry within ~0.1%,
# comparable to the 1/8-column snapping of the exact kernels. The knot
# matmul runs in bf16 (fp32 accumulation): ~0.4% per-element rounding
# averages to ≲0.02% over the ~10³-term reduction.

KNOT_DELTA = 8  # knot spacing in λ columns


def build_knot_matrix_device(filter_set, lam_rest, dlog: float,
                             max_shift: int, n_wav: int,
                             delta: int = KNOT_DELTA, l_range=None):
    """(L, K·F8) knot table M[l, k·F8+f] = T_f(λ0·10^{(l + kδ)Δ}), built on
    device (only the raw filter curves cross the host link). Returns
    (M, n_knots).

    l_range=(l_lo, l_hi) builds only those rows: rows outside the union
    filter support over every knot shift are identically zero and
    contribute nothing to any band numerator, so trimming them is exact —
    it just shrinks the MXU matmul and the captured constant (the red tail
    of the rest grid no filter ever redshifts onto is typically 30-40% of
    a production grid). Callers must slice fnu_w to the same rows."""
    f = len(filter_set)
    f8 = int(np.ceil(f / 8) * 8)
    n_knots = int(max_shift // delta) + 2  # cover s ∈ [0, max_shift]
    lam0 = float(lam_rest[0])
    k_len = max(len(filt.lam) for filt in filter_set.filters)
    filt_lam = np.zeros((f, k_len), np.float32)
    filt_tr = np.zeros((f, k_len), np.float32)
    for i, filt in enumerate(filter_set.filters):
        n = len(filt.lam)
        filt_lam[i, :n] = filt.lam
        filt_tr[i, :n] = filt.transmission
        if n < k_len:
            last = float(filt.lam[-1])
            filt_lam[i, n:] = last * (1.0 + 1.0e-6 * np.arange(1, k_len - n + 1))
    l_lo, l_hi = (0, n_wav) if l_range is None else l_range
    return _knot_matrix_on_device(
        jnp.asarray(filt_lam), jnp.asarray(filt_tr), jnp.float32(lam0),
        jnp.float32(dlog), l_lo=int(l_lo), l_hi=int(l_hi), n_knots=n_knots,
        f8=f8, delta=delta,
    ), n_knots


@functools.partial(jax.jit,
                   static_argnames=("l_lo", "l_hi", "n_knots", "f8", "delta"))
def _knot_matrix_on_device(filt_lam, filt_tr, lam0, dlog, l_lo: int,
                           l_hi: int, n_knots: int, f8: int, delta: int):
    l_idx = jnp.arange(l_lo, l_hi, dtype=jnp.float32)

    def one_knot(k):
        lam_eval = lam0 * 10.0 ** ((l_idx + k * delta) * dlog)

        def one_filter(fl, ft):
            return jnp.interp(lam_eval, fl, ft, left=0.0, right=0.0)

        t = jax.vmap(one_filter)(filt_lam, filt_tr)  # (F, L)
        pad_f = f8 - t.shape[0]
        if pad_f:
            t = jnp.pad(t, ((0, pad_f), (0, 0)))
        return t

    m = jax.vmap(one_knot)(jnp.arange(n_knots, dtype=jnp.float32))
    # (K, F8, L) -> (L, K*F8)
    return jnp.transpose(m, (2, 0, 1)).reshape(l_hi - l_lo, n_knots * f8)


KNOT_INTERP_ORDER = 3  # Catmull-Rom cubic across knots (1 = linear)


def _knot_interp(vals, s, n_knots: int, delta: int, order: int):
    """(B, K, F) knot samples -> (B, F) at real column shifts s.

    order=1: lerp between the bracketing knots — error O((δ/W)²), which
    reaches percent level for narrow (medium-band) filters where a sharp
    SED feature crosses the band. order=3 (default): MONOTONE cubic
    Hermite through 4 knots with Fritsch–Butland limited slopes — near
    O((δ/W)³-⁴) in smooth regions, and NO overshoot at kinks (a plain
    Catmull-Rom overshoots where a Lyman break sweeps a narrow band,
    blowing the relative error exactly where fluxes are tiny). End knots
    use linearly-extrapolated virtual neighbours so z≈0 and z≈z_max stay
    smooth.

    num AND den must use the same order/knots: the band-edge staircase
    cancels in the ratio only when both interpolate identically.
    """
    c = jnp.clip(s, 0.0, (n_knots - 1) * delta - 1.0e-3) / delta
    k = jnp.floor(c).astype(jnp.int32)  # 0 .. n_knots-2
    t = (c - k.astype(c.dtype))[:, None]
    shared = vals.ndim == 2  # (K, F) table shared by the whole batch

    if order == 1:
        if shared:
            # direct fancy-indexed gather — broadcasting the table to
            # (B, K, F) first would materialize hundreds of MB
            lo, hi = vals[k], vals[k + 1]
        else:
            idx = jnp.stack([k, k + 1], axis=1)  # (B, 2)
            g = jnp.take_along_axis(vals, idx[:, :, None], axis=1)
            lo, hi = g[:, 0], g[:, 1]
        return lo * (1.0 - t) + hi * t

    # Cubic. The end knots use linearly-extrapolated virtual neighbours;
    # rather than CONCATENATING padded rows (a full copy of the (B, K, F)
    # knot tensor — ~260 MB of HBM traffic at 65k batches), gather with
    # clipped indices and patch the two edge cases with selects.
    km1 = jnp.maximum(k - 1, 0)
    kp2 = jnp.minimum(k + 2, n_knots - 1)
    if shared:
        vm1, v0, v1, v2 = vals[km1], vals[k], vals[k + 1], vals[kp2]
    else:
        # Batched 4-row fetch as a one-hot batched matmul instead of
        # take_along_axis: TPU gather lowering is scalar-unit-bound, while
        # the (B, 4, K) @ (B, K, F) dot streams the knot tensor through the
        # MXU once (~15% faster through the full pipeline at 65k × K=120).
        # Precision.HIGHEST keeps the 0/1-mask selection exact — DEFAULT
        # would round the fp32 knot values to bf16 (~0.4% error).
        j = jnp.arange(n_knots, dtype=jnp.int32)[None, :]
        masks = jnp.stack([
            (j == km1[:, None]), (j == k[:, None]),
            (j == (k + 1)[:, None]), (j == kp2[:, None]),
        ], axis=1).astype(vals.dtype)  # (B, 4, K)
        g = jax.lax.dot_general(
            masks, vals, (((2,), (1,)), ((0,), (0,))),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)  # (B, 4, F)
        vm1, v0, v1, v2 = g[:, 0], g[:, 1], g[:, 2], g[:, 3]
    lo_edge = (k == 0)[:, None]
    hi_edge = (k + 2 > n_knots - 1)[:, None]
    vm1 = jnp.where(lo_edge, 2.0 * v0 - v1, vm1)
    v2 = jnp.where(hi_edge, 2.0 * v1 - v0, v2)
    d0, d1, d2 = v0 - vm1, v1 - v0, v2 - v1

    def slope(da, db):
        # Fritsch–Butland harmonic mean: zero at sign changes (kinks),
        # ≈ centered difference in smooth monotone regions. Written in
        # SCALE-NORMALIZED form m·2·n_a·n_b/(n_a+n_b) with n = d/m,
        # m = |da|+|db|: the product form da·db overflows fp32 forward at
        # L_ν-scale knot values (~1e30 in the fused photometry path), and
        # the reciprocal form 2/(1/da+1/db) overflows in the BACKWARD pass
        # (the VJP forms 1/r² with r ~ 1e-29 → 1e58; its partner −da⁻²
        # underflows to 0 → inf·0 = NaN — this is why the simulator is
        # differentiable: see mcmc.fit_observation_hmc). Normalized,
        # |n_a + n_b| = 1 exactly for same-sign inputs, so both passes are
        # perfectly conditioned at any magnitude.
        same = ((da > 0.0) & (db > 0.0)) | ((da < 0.0) & (db < 0.0))
        m = jnp.abs(da) + jnp.abs(db)
        # FORWARD-mode trap (round-5 verify drive): the JVP rule for
        # div(x, y) forms (-g·x)·y⁻²; at knot-value scales y = m ~ 1e30
        # that is inf·0 = NaN even though the true tangent is O(g). The
        # normalized slopes are homogeneous of degree 0 in (da, db), so
        # rescaling both by a STOP-GRADIENT 1/m changes nothing — primal
        # or derivative, either AD mode — while keeping every division
        # operand O(1).
        sc = jax.lax.stop_gradient(1.0 / jnp.maximum(m, 1.0e-30))
        das, dbs = da * sc, db * sc
        ms = jnp.abs(das) + jnp.abs(dbs)  # carries tangents, O(1)
        ms_s = jnp.where(same, ms, 1.0)
        na = jnp.where(same, das / ms_s, 0.5)
        nb = jnp.where(same, dbs / ms_s, 0.5)
        return jnp.where(same, m * (2.0 * na * nb) / (na + nb), 0.0)

    m0, m1 = slope(d0, d1), slope(d1, d2)
    t2 = t * t
    t3 = t2 * t
    h00 = 2.0 * t3 - 3.0 * t2 + 1.0
    h10 = t3 - 2.0 * t2 + t
    h01 = -2.0 * t3 + 3.0 * t2
    h11 = t3 - t2
    return h00 * v0 + h10 * m0 + h01 * v1 + h11 * m1


def interp_photometry_num(fnu_w, knot_matrix, n_knots: int, s,
                          delta: int = KNOT_DELTA,
                          matmul_dtype=jnp.bfloat16,
                          order: int = KNOT_INTERP_ORDER):
    """Numerators via the knot matmul + per-galaxy shift interpolation.

    Args:
        fnu_w: (B, L) flux × dλ/λ weights.
        knot_matrix: (L, K·F8) from build_knot_matrix_device.
        s: (B,) real column shifts log10(1+z)/Δ (NOT snapped).
    Returns:
        (B, F8) numerators.
    """
    b, n_l = fnu_w.shape
    f8 = knot_matrix.shape[1] // n_knots
    num_all = jnp.matmul(
        fnu_w.astype(matmul_dtype),
        knot_matrix.astype(matmul_dtype),
        preferred_element_type=jnp.float32,
    ).reshape(b, n_knots, f8)
    return _knot_interp(num_all, s, n_knots, delta, order)


def interp_photometry_den(den_table, n_knots: int, s,
                          delta: int = KNOT_DELTA,
                          order: int = KNOT_INTERP_ORDER):
    """Denominators interpolated at the SAME knots/weights as the numerator.

    Crucial for accuracy: num(s) and den(s) share a staircase (one λ sample
    enters/leaves the band each column as the filter edge crosses it — a
    ~1/W jump with W the band width in columns, ~2% for W≈45). Snapping or
    interpolating num and den at the SAME shifts cancels the staircase in
    the ratio; mixing an interpolated num with an exact den leaks it.

    den_table: (N_SUB·max_shift + N_SUB, F) from build_den_table (1/8-col
    resolution; knots sample rows k·δ·N_SUB).
    """
    n_max = den_table.shape[0] - 1
    knot_rows = jnp.minimum(
        jnp.arange(n_knots) * delta * N_SUB, n_max)
    den_knots = den_table[knot_rows]  # (K, F), shared across the batch
    return _knot_interp(den_knots, s, n_knots, delta, order)


def conv_photometry_num(fnu_w, ext_table, n_knots: int, s,
                        delta: int = KNOT_DELTA,
                        matmul_dtype=jnp.bfloat16,
                        order: int = KNOT_INTERP_ORDER,
                        chunk_knots: int = 16, l_offset: int = 0,
                        filter_cols=None, group_filters: int = 8):
    """Numerators via chunked on-the-fly knot matmuls — mathematically
    identical to the interp variant (knot-matrix row k IS ext_table sliced
    at offset k·δ: M[l, k, f] = G[l + kδ, f]) without a materialized
    persistent knot matrix. At paper scale (10⁴ λ × 63 filters) that matrix
    is ~400 MB of jit-captured constants — past the axon remote-compile
    request cap — while G is ~3 MB; each (L, Kc·F) chunk is gathered from G
    INSIDE the jit (a transient, not a constant), matmul'd, and released.
    Chunking keeps the MXU-bound reuse of the one-shot matmul: fnu_w is
    re-read only K/Kc times. (A lax.conv_general_dilated formulation is
    mathematically equivalent but XLA's CPU/TPU lowering for stride-δ,
    kernel-length-L convs ran ~7× slower than these plain matmuls.)

    Args:
        fnu_w: (B, L) flux × dλ/λ weights; rows l_offset..l_offset+L-1 of
            the rest grid (pre-sliced to the union filter support — see
            `build_knot_matrix_device`'s l_range note).
        ext_table: (F, n_cols) transmissions at λ0·10^{jΔ}
            (`FilterSet.shifted_table` output).
        s: (B,) real column shifts log10(1+z)/Δ.
        l_offset: absolute rest-grid column of fnu_w[:, 0].
        filter_cols: optional static tuple of per-filter (c0, c1) nonzero
            column ranges on ext_table. When given, switches to the
            WINDOWED engine: filters are sorted by support start and
            grouped; each (group, knot-chunk) matmul reads only the λ
            window that can reach that group at those shifts. Dense the
            numerator is ~2% nonzero at paper scale (63 filters × 10⁴ λ),
            so the windowed engine cuts the MXU work ~5× with bit-identical
            G values (only the summation grouping changes).
        group_filters: filters per window group (windowed engine only).
    Returns:
        (B, F) numerators (same shift-space knot interpolation as the
        interp variant; pair with `interp_photometry_den`).
    """
    b, n_l = fnu_w.shape
    f = ext_table.shape[0]
    need = l_offset + n_l + (n_knots - 1) * delta + 1
    if ext_table.shape[1] < need:
        ext_table = jnp.pad(
            ext_table, ((0, 0), (0, need - ext_table.shape[1])))
    g_t = ext_table.T.astype(matmul_dtype)  # (n_cols, F)
    fw = fnu_w.astype(matmul_dtype)
    if filter_cols is not None:
        num_all = _conv_num_windowed(
            fw, g_t, n_knots, delta, chunk_knots, l_offset,
            filter_cols, group_filters)
        return _knot_interp(num_all, s, n_knots, delta, order)
    l_idx = jnp.arange(l_offset, l_offset + n_l)[:, None]  # (L, 1)
    chunks = []
    for k0 in range(0, n_knots, chunk_knots):
        kc = min(chunk_knots, n_knots - k0)
        col = (k0 + jnp.arange(kc)) * delta  # (Kc,)
        m = g_t[l_idx + col[None, :]]  # (L, Kc, F) transient gather
        out = jnp.matmul(fw, m.reshape(n_l, kc * f),
                         preferred_element_type=jnp.float32)
        chunks.append(out.reshape(b, kc, f))
    num_all = jnp.concatenate(chunks, axis=1)  # (B, K, F)
    return _knot_interp(num_all, s, n_knots, delta, order)


def _conv_num_windowed(fw, g_t, n_knots: int, delta: int, chunk_knots: int,
                       l_offset: int, filter_cols, group_filters: int):
    """Windowed conv numerators: (B, K, F) knot samples.

    For filter f with support cols [c0_f, c1_f) on the extended table,
    num[b, k, f] = Σ_l fw[b, l]·G[f, l + kδ] is nonzero only for
    l ∈ [c0_f - kδ, c1_f - kδ). Sorting filters by c0 and grouping ~8
    neighbours, each (group, knot-chunk) needs one window of
    V_g = span_g + (Kc-1)δ columns — a (B, V_g) @ (V_g, Kc·Fg) matmul —
    instead of the full (B, L) @ (L, Kc·F). All indices are static; fw is
    zero-padded on the blue side so every window has the same width per
    group (shape reuse across chunks; out-of-range lanes multiply zeros).
    """
    b, n_l = fw.shape
    f = g_t.shape[1]
    c0 = np.array([c[0] for c in filter_cols])
    c1 = np.array([c[1] for c in filter_cols])
    order_f = np.argsort(c0, kind="stable")
    groups = []
    for gi in range(0, f, group_filters):
        idx = order_f[gi:gi + group_filters]
        groups.append((idx, int(c0[idx].min()), int(c1[idx].max())))
    # ONE window width for every (group, chunk): widened lanes only meet
    # zero transmission for that group's filters, so padding to a common V
    # is exact — and it collapses the program to ≤4 matmul shapes (full /
    # tail chunk × full / tail group) instead of one per pair, which keeps
    # the remote compile fast
    v_win = (max(a1 - a0 for _, a0, a1 in groups)
             + (chunk_knots - 1) * delta)
    plan = []  # (k0, kc, [(idx, w_start), ...])
    w_min = l_offset
    for k0 in range(0, n_knots, chunk_knots):
        kc = min(chunk_knots, n_knots - k0)
        row = []
        for idx, a0, a1 in groups:
            w_end = min(a1 - k0 * delta, l_offset + n_l)
            w_start = w_end - v_win
            w_min = min(w_min, w_start)
            row.append((idx, w_start))
        plan.append((k0, kc, row))
    pad_left = l_offset - w_min
    fw_pad = jnp.pad(fw, ((0, 0), (pad_left, 0)))  # covers cols ≥ w_min
    chunk_outs = []
    for k0, kc, row in plan:
        col = (k0 + jnp.arange(kc)) * delta  # (Kc,)
        per_group = []
        for idx, w_start in row:
            win = fw_pad[:, w_start - w_min:w_start - w_min + v_win]
            # absolute cols of the window; cols < l_offset sit in the
            # zero pad, so the clamped G rows they gather multiply zeros
            j = jnp.maximum(
                jnp.arange(w_start, w_start + v_win), 0)[:, None]
            m = g_t[:, idx][j + col[None, :]]  # (V, Kc, Fg) transient
            out = jnp.matmul(win, m.reshape(v_win, kc * len(idx)),
                             preferred_element_type=jnp.float32)
            per_group.append(out.reshape(b, kc, len(idx)))
        chunk_outs.append(jnp.concatenate(per_group, axis=2))
    num_sorted = jnp.concatenate(chunk_outs, axis=1)  # (B, K, F sorted)
    inv = np.argsort(order_f)
    return num_sorted[:, :, inv]
