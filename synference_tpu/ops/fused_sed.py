"""Single-pass SED→photometry megakernel.

The XLA fused path (`sed.py::_photometry_fused`) runs three HBM-bound
stages per batch: the SFZH⊗spectra contraction writes `lnu` (B, L) to HBM
(~0.5 GB at 65k × 2048 λ), the knot matmul reads it back and writes the
(B, K·F8) knot tensor (~0.25 GB), and the shift-space interpolation reads
that again through TPU's scalar-unit gather path. Ablation on v5e puts the
interp + round-trips at ~7 ms of a ~9 ms batch — far above the ~1.5 ms the
arithmetic needs.

This kernel runs the WHOLE chain per 256-galaxy block with every
intermediate resident in VMEM:

    lnu  = sfzh_blk @ S'            (MXU, compute dtype; S' = spectra·w_λ)
    fw   = lnu · (fesc + (1−fesc)·exp(−τ_v·k_λ))       (VPU outer-product)
    acc  = bf16(fw) @ M             (MXU; M = IGM-baked knot matrix)
    num  = monotone-cubic shift interp of acc           (see below)
    out  = num / den(s) · scale                         (per-galaxy flux)

Nothing (B, L)- or (B, K·F8)-shaped ever touches HBM; traffic is the
(B, C) weights in and (B, F8) fluxes out.

Per-galaxy knot-row extraction without gathers: selecting knot row r of
`acc` (bb, K·F8) is `where(lane_knot_index == r, acc, 0) @ E` where
E[j, j mod F8] = 1 — a VPU compare/select plus a skinny MXU matmul, both
lane-parallel. Four such selections feed the same Fritsch–Butland monotone
cubic as `photometry_kernel._knot_interp` (bit-compatible weights); the
shared den table uses the same trick over its K rows, so the num/den
staircase cancellation is preserved exactly.

Two entry points share one kernel body and one call wrapper: the
full-table `fused_sed_photometry` (static tables prepared once at setup)
and the z-sorted window variant `fused_window_photometry` (traced
per-sub-chunk table slices). The den-slope prep, lane maps, block sizing,
and BlockSpec wiring live in shared helpers so the num/den staircase
cancellation can never desynchronize between the two.

Reference counterpart: the Synthesizer C/OpenMP per-galaxy SED loop the
reference drives via `pipeline.run()` (`library.py:2592-2619`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_sed_photometry", "fused_window_photometry",
           "prepare_megakernel_tables", "megakernel_vmem_bytes"]

_LANE = 128


def _pad_to(n: int, m: int) -> int:
    return int(np.ceil(n / m) * m)


def _kof_lanes(kf: int, kfp: int, f8: int):
    """Lane -> knot-index map (−1 in the padding so selections never
    match). Shared by both megakernel entry points."""
    kof = np.full((1, kfp), -1.0, np.float32)
    kof[0, :kf] = np.arange(kf) // f8
    return jnp.asarray(kof)


def _den_lane_tables(den_knots, kf: int, kfp: int):
    """Denominator knots + Fritsch–Butland slopes on the numerator's lane
    layout (lane j = knot j//F8, band j%F8).

    Num and den MUST interpolate identically for the staircase to cancel;
    the edge rows use the forward/backward difference, which at true table
    edges is exactly `photometry_kernel._knot_interp`'s virtual-endpoint
    rule (window callers only ever select edge rows there). Works on host
    numpy (setup-time full table) and traced jnp (per-window slices) alike.
    """
    den_knots = jnp.asarray(den_knots, jnp.float32)  # (K, F8)
    dd = den_knots[1:] - den_knots[:-1]  # (K-1, F8)
    mid = _fb_slope(dd[:-1], dd[1:])  # rows 1..K-2
    den_m = jnp.concatenate([dd[:1], mid, dd[-1:]], axis=0)
    denv = jnp.zeros((1, kfp), jnp.float32).at[0, :kf].set(
        den_knots.reshape(-1))
    denm = jnp.zeros((1, kfp), jnp.float32).at[0, :kf].set(
        den_m.reshape(-1))
    return denv, denm


def prepare_megakernel_tables(sed_table, wlam, dust_curve, knot_matrix,
                              den_table, n_knots: int, delta: int, f8: int,
                              compute_dtype=jnp.float32):
    """Pad + cast the static tables once at simulator setup.

    Args:
        sed_table: (C, L) summed grid spectra for the reprocessed channel.
        wlam: (L,) dλ/λ quadrature weights (folded into the spectra so the
            kernel's dust multiply is the only per-galaxy elementwise op).
        dust_curve: (L,) attenuation curve k_λ/R_V (τ multiplier).
        knot_matrix: (L, K·F8) IGM-baked knot table.
        den_table: (N_SUB·ms+N_SUB, F) exact denominators; knot rows are
            sliced here exactly as `interp_photometry_den` does.
    Returns:
        dict of device arrays keyed for `fused_sed_photometry`.
    """
    c, n_l = sed_table.shape
    kf = knot_matrix.shape[1]
    cp = _pad_to(c, _LANE)
    lp = _pad_to(n_l, _LANE)
    kfp = _knot_lanes(kf, f8)
    n_knots_real = kf // f8
    sedp = jnp.zeros((cp, lp), compute_dtype)
    sedp = sedp.at[:c, :n_l].set(
        (sed_table * wlam[None, :]).astype(compute_dtype))
    knotp = jnp.zeros((lp, kfp), jnp.bfloat16)
    knotp = knotp.at[:n_l, :kf].set(knot_matrix.astype(jnp.bfloat16))
    # den knots at the SAME shifts as the knot matrix rows
    from .photometry_kernel import N_SUB

    n_max = den_table.shape[0] - 1
    rows = np.minimum(np.arange(n_knots) * delta * N_SUB, n_max)
    den_knots = np.zeros((n_knots_real, f8), np.float32)
    den_knots[:, : den_table.shape[1]] = np.asarray(den_table)[rows]
    denv, denm = _den_lane_tables(den_knots, kf, kfp)
    curvep = jnp.zeros((1, lp), jnp.float32)
    curvep = curvep.at[0, :n_l].set(jnp.asarray(dust_curve, jnp.float32))
    return {
        "sed": sedp,
        "curve": curvep,
        "knot": knotp,
        "kof": _kof_lanes(kf, kfp, f8),
        "den": denv,
        "denm": denm,
        "dims": (c, n_l, kf, kfp),
    }


def _knot_lanes(kf: int, f8: int) -> int:
    """Lane count for the knot tensor: F8 · 2^m ≥ kf, multiple of 128 —
    the log-step roll reduction needs a power-of-two number of knot slots
    per band."""
    kfp = f8
    while kfp < kf or kfp % _LANE:
        kfp *= 2
    return kfp


def megakernel_vmem_bytes(c: int, n_l: int, kf: int, f8: int, block_b: int,
                          compute_bytes: int = 4) -> int:
    """Rough VMEM footprint: resident tables + per-block intermediates."""
    cp, lp, kfp = _pad_to(c, _LANE), _pad_to(n_l, _LANE), _knot_lanes(kf, f8)
    tables = cp * lp * compute_bytes + lp * kfp * 2 + 4 * kfp * 4
    block = (block_b * cp * 4 + 2 * block_b * lp * 4
             + 6 * block_b * kfp * 4)
    return tables + block


def _fb_slope(da, db):
    """Fritsch–Butland harmonic-mean slope (matches _knot_interp)."""
    same = ((da > 0.0) & (db > 0.0)) | ((da < 0.0) & (db < 0.0))
    da_s = jnp.where(same, da, 1.0)
    db_s = jnp.where(same, db, 1.0)
    return jnp.where(same, 2.0 / (1.0 / da_s + 1.0 / db_s), 0.0)


def _mega_kernel(sfzh_ref, gal_ref, sed_ref, curve_ref, knot_ref, kof_ref,
                 den_ref, denm_ref, out_ref, *, n_knots, delta,
                 f8, order, fesc, interpret):
    w = sfzh_ref[...]  # (bb, Cp) f32
    lnu = jnp.dot(w.astype(sed_ref.dtype), sed_ref[...],
                  preferred_element_type=jnp.float32)  # (bb, Lp)
    tau = gal_ref[:, 1][:, None]  # (bb, 1)
    att = jnp.exp(-tau * curve_ref[...])  # (bb, Lp) outer-product exp
    if fesc:
        att = fesc + (1.0 - fesc) * att
    fw = (lnu * att).astype(jnp.bfloat16)
    acc = jnp.dot(fw, knot_ref[...],
                  preferred_element_type=jnp.float32)  # (bb, KFp)

    s = gal_ref[:, 0][:, None]  # (bb, 1) real column shift
    c = jnp.clip(s, 0.0, (n_knots - 1) * delta - 1.0e-3) / delta
    k = jnp.floor(c).astype(jnp.int32)  # (bb, 1), 0..n_knots-2
    t = c - k.astype(c.dtype)  # (bb, 1)
    kof = kof_ref[...]  # (1, KFp) knot index per lane, −1 in padding
    kf32 = k.astype(jnp.float32)
    mask0 = kof == kf32  # (bb, KFp) lanes of knot row k
    mask1 = kof == kf32 + 1.0  # lanes of knot row k+1
    roll = jnp.roll if interpret else pltpu.roll
    den_l = den_ref[...]  # (1, KFp) den knots on the same lane layout
    denm_l = denm_ref[...]

    if order == 1:
        r = (jnp.where(mask0, (1.0 - t) * acc, 0.0)
             + jnp.where(mask1, t * acc, 0.0))
        rd = (jnp.where(mask0, (1.0 - t) * den_l, 0.0)
              + jnp.where(mask1, t * den_l, 0.0))
    else:
        # Monotone-cubic Hermite, restructured for the vector unit: the
        # Fritsch–Butland slope of EVERY knot row comes from two static
        # ±1-knot lane rotations (±F8 lanes) — no per-galaxy gathers —
        # then the four Hermite terms collapse into ONE masked lane
        # combination. Identical arithmetic to
        # `photometry_kernel._knot_interp` (edge rows reduce to the
        # forward/backward difference, which is exactly the
        # virtual-endpoint extrapolation it applies).
        prev = roll(acc, f8, axis=1)  # lane j -> acc[j - F8] (knot k-1)
        # pltpu.roll requires a non-negative shift: -F8 ≡ KFp-F8 (mod KFp)
        nxt = roll(acc, acc.shape[1] - f8, axis=1)  # knot k+1
        m = _fb_slope(acc - prev, nxt - acc)
        m = jnp.where(kof == 0.0, nxt - acc, m)  # wrap lanes overridden
        m = jnp.where(kof == float(n_knots - 1), acc - prev, m)
        t2 = t * t
        t3 = t2 * t
        h00 = 2.0 * t3 - 3.0 * t2 + 1.0
        h10 = t3 - 2.0 * t2 + t
        h01 = -2.0 * t3 + 3.0 * t2
        h11 = t3 - t2
        r = (jnp.where(mask0, h00 * acc + h10 * m, 0.0)
             + jnp.where(mask1, h01 * acc + h11 * m, 0.0))
        rd = (jnp.where(mask0, h00 * den_l + h10 * denm_l, 0.0)
              + jnp.where(mask1, h01 * den_l + h11 * denm_l, 0.0))

    # log-step cyclic roll reduction: after log2(KFp/F8) halving steps every
    # lane holds the sum of its residue class mod F8 — the per-band total —
    # in exact fp32 adds, no MXU pass, no gather
    kfp = acc.shape[1]
    step = kfp // 2
    while step >= f8:
        r = r + roll(r, step, axis=1)
        rd = rd + roll(rd, step, axis=1)
        step //= 2

    scale = gal_ref[:, 2][:, None]  # (bb, 1)
    out_ref[...] = (r / jnp.maximum(rd, 1.0e-30) * scale)[:, :f8]


def _mega_call(sfzh, s, tau_v, scale, sedp, curvep, knotp, kof, denv, denm,
               n_knots: int, delta: int, f8: int, order: int, fesc: float,
               block_b: int):
    """Block sizing + pallas_call wiring shared by both entry points.

    Mosaic needs the galaxy block divisible by 8: shrink toward the batch
    but never below 8, then zero-pad the batch up to a block multiple
    (padded rows have scale 0 -> flux 0; sliced off at the end).
    """
    b = sfzh.shape[0]
    cp, lp = sedp.shape
    kfp = knotp.shape[1]
    bb = min(block_b, max(8, _pad_to(b, 8)))
    while b % bb and bb > 8:
        bb //= 2
    bb = max(bb, 8)
    bp = _pad_to(b, bb)
    gal = jnp.stack([s, tau_v, scale, jnp.zeros_like(s)], axis=1)  # (B, 4)
    if bp != b:
        sfzh = jnp.pad(sfzh, ((0, bp - b), (0, 0)))
        gal = jnp.pad(gal, ((0, bp - b), (0, 0)))
    # off-TPU (tests, CPU meshes) the kernel runs in interpret mode — same
    # jnp semantics, no Mosaic
    interpret = jax.default_backend() != "tpu"
    kernel = functools.partial(
        _mega_kernel, n_knots=n_knots, delta=delta, f8=f8, order=order,
        fesc=fesc, interpret=interpret)
    out = pl.pallas_call(
        kernel,
        interpret=interpret,
        out_shape=jax.ShapeDtypeStruct((bp, f8), jnp.float32),
        grid=(bp // bb,),
        in_specs=[
            pl.BlockSpec((bb, cp), lambda i: (i, 0)),
            pl.BlockSpec((bb, 4), lambda i: (i, 0)),
            pl.BlockSpec((cp, lp), lambda i: (0, 0)),
            pl.BlockSpec((1, lp), lambda i: (0, 0)),
            pl.BlockSpec((lp, kfp), lambda i: (0, 0)),
            pl.BlockSpec((1, kfp), lambda i: (0, 0)),
            pl.BlockSpec((1, kfp), lambda i: (0, 0)),
            pl.BlockSpec((1, kfp), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((bb, f8), lambda i: (i, 0)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
    )(sfzh, gal, sedp, curvep, knotp, kof, denv, denm)
    return out[:b] if bp != b else out


def fused_sed_photometry(sfzh, s, tau_v, scale, tables, n_knots: int,
                         delta: int, f8: int, order: int = 3,
                         fesc: float = 0.0, block_b: int = 256):
    """θ-derived per-galaxy inputs -> (B, F8) band fluxes, one kernel.

    Args:
        sfzh: (B, C) SFZH mass weights [Msun].
        s: (B,) real column shifts log10(1+z)/Δ.
        tau_v: (B,) V-band optical depths (zeros when dust-free).
        scale: (B,) observed-frame scalar (1+z)·1e-6/(4π d19²).
        tables: dict from `prepare_megakernel_tables` (+ "curve": (L,)
            dust curve k_λ/R_V, zero-padded to Lp by the caller wrapper).
    """
    cp = tables["sed"].shape[0]
    if sfzh.shape[1] != cp:
        sfzh = jnp.pad(sfzh, ((0, 0), (0, cp - sfzh.shape[1])))
    return _mega_call(sfzh, s, tau_v, scale, tables["sed"], tables["curve"],
                      tables["knot"], tables["kof"], tables["den"],
                      tables["denm"], n_knots=n_knots, delta=delta, f8=f8,
                      order=order, fesc=fesc, block_b=block_b)


def fused_window_photometry(sfzh, s_rel, tau_v, scale, sed_w, curve_w,
                            knot_w, den_w, kc: int, delta: int, f8: int,
                            order: int = 3, fesc: float = 0.0,
                            block_b: int = 256):
    """Megakernel over a z-sorted WINDOW: traced per-sub-chunk tables.

    The full-table megakernel loses above ~4096 λ because its VMEM-resident
    tables outgrow the chip; the z-sorted engine's per-sub-chunk windows
    (λ slice `sed_w`, knot slice `knot_w`) are small at ANY grid size, so
    the single-pass chain — contraction, dust, knot matmul, monotone-cubic
    shift interpolation, den ratio, distance scale — runs with every
    (B, w)-shaped intermediate in VMEM. Called from
    `sed.BatchSEDSimulator._zsorted_run_raw(fused=True)` inside the scan
    over sub-chunks; all table args are traced values (dynamic slices of
    the full tables), only shapes are static.

    Args:
        sfzh: (B, C) SFZH weights.
        s_rel: (B,) column shifts RELATIVE to the window (s − k0·delta).
        tau_v, scale: (B,) dust depth / observed-frame scalar.
        sed_w: (C, W) window spectra with dλ/λ weights folded (fp32).
        curve_w: (W,) dust curve window.
        knot_w: (W, kc·F8) IGM-baked knot-matrix window.
        den_w: (kc, F8) exact denominator knots for the window.
    """
    b, c = sfzh.shape
    w = sed_w.shape[1]
    kf = kc * f8
    cp = _pad_to(c, _LANE)
    lp = _pad_to(w, _LANE)
    kfp = _knot_lanes(kf, f8)
    if cp != c:
        sfzh = jnp.pad(sfzh, ((0, 0), (0, cp - c)))
        sed_w = jnp.pad(sed_w, ((0, cp - c), (0, 0)))
    if lp != w:
        sed_w = jnp.pad(sed_w, ((0, 0), (0, lp - w)))
        curve_w = jnp.pad(curve_w, (0, lp - w))
        knot_w = jnp.pad(knot_w, ((0, lp - w), (0, 0)))
    knotp = jnp.zeros((lp, kfp), jnp.bfloat16)
    knotp = knotp.at[:, :kf].set(knot_w.astype(jnp.bfloat16))
    denv, denm = _den_lane_tables(den_w, kf, kfp)
    curve2 = curve_w.astype(jnp.float32)[None, :]
    return _mega_call(sfzh, s_rel, tau_v, scale,
                      sed_w.astype(jnp.float32), curve2, knotp,
                      _kof_lanes(kf, kfp, f8), denv, denm,
                      n_knots=kc, delta=delta, f8=f8, order=order,
                      fesc=fesc, block_b=block_b)
