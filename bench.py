"""Benchmark driver: prints ONE JSON line with the headline metric.

Primary metric: mock SEDs/sec through the full θ -> photometry pipeline
(48×8 SPS grid, 2048 λ bins, 7 NIRCam-like bands, lognormal SFH + Calzetti
dust + Madau IGM) on one chip — the direct counterpart of the reference's
Synthesizer C/OpenMP `pipeline.run()` hot loop.

Secondary metrics included as extra JSON fields: NPE (NSF) train steps/sec
and posterior samples/sec.

vs_baseline: the reference publishes no numbers (BASELINE.md). Estimate from
its paper-scale run: 100,000 SEDs generated on 6 nodes × 28 cores in
"hours" (examples/library_generation/scripts/make_library.slurm); assuming
2 h wall time -> ~13.9 SEDs/sec for the full cluster. vs_baseline is ours /
13.9 on ONE chip.
"""

import json
import os
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_synference")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import optax  # noqa: E402

import synference_tpu as st  # noqa: E402
from synference_tpu.flows import build_flow  # noqa: E402

REF_SEDS_PER_SEC = 13.9  # see module docstring


def bench_generation(batch=65536, iters=8, n_ages=48, n_mets=8, n_wav=2048,
                     filters=None, lam_min=300.0, sub=1024):
    grid = st.make_synthetic_grid(n_ages=n_ages, n_mets=n_mets, n_wav=n_wav,
                                  lam_min=lam_min)
    if filters is None:
        centers = [9000.0, 11500.0, 15000.0, 20000.0, 27700.0, 35600.0,
                   44400.0]
        widths = [2000.0, 2600.0, 3300.0, 4600.0, 7000.0, 7800.0, 10200.0]
        filters = st.FilterSet([
            st.tophat_filter(f"F{i}", c, w)
            for i, (c, w) in enumerate(zip(centers, widths))
        ])
    sim = st.BatchSEDSimulator(
        grid=grid, filters=filters,
        param_names=("log10_mass", "redshift", "peak_age", "tau",
                     "log10_metallicity", "tau_v"),
        sfh="lognormal", zdist="delta",
        emission=st.EmissionConfig(igm="inoue14"),
    )
    rng = np.random.default_rng(0)
    theta = jnp.asarray(np.stack([
        rng.uniform(7.5, 11, batch), rng.uniform(0.05, 10, batch),
        rng.uniform(5e7, 1e9, batch), rng.uniform(0.1, 1.2, batch),
        rng.uniform(-3.9, -1.5, batch), rng.uniform(0, 3, batch),
    ], axis=1), jnp.float32)
    fn = jax.jit(sim.photometry)
    fn(theta).block_until_ready()
    t0 = time.time()
    for _ in range(iters):
        p = fn(theta)
    p.block_until_ready()
    dt = (time.time() - t0) / iters
    engine = sim._pallas_variant if sim.photometry_backend == "pallas" \
        else sim.photometry_backend
    if sim.photometry_backend == "pallas" and sim._mega_supported():
        engine = "megakernel"
    # z-sorted window engine: the library-generation path (LibraryGenerator
    # sorts its draws by redshift) — narrow-z sub-chunks contract only the
    # reachable λ/knot windows
    zs_rate = zsf_rate = None
    if sim._window_supported():
        # device-resident engine: θ sorted + window-planned on device, no
        # per-call host staging — this is what LibraryGenerator's
        # device_sampling path drives (through the axon tunnel each
        # host→device transfer costs ~60 ms; the old host-planned API paid
        # ~115 ms of staging per 13 ms of realistic-size compute)
        th_np = np.asarray(theta)
        z_sorted = np.sort(th_np[:, 1], kind="stable")
        th_sorted = jnp.asarray(
            th_np[np.argsort(th_np[:, 1], kind="stable")])
        span = sim.zsorted_max_span(z_sorted, sub)
        kc, w_cols = sim._zsorted_plan(span)
        kw = dict(sub_chunk=sub, kc=kc, w_cols=w_cols)
        jax.block_until_ready(
            sim.photometry_zsorted_device(th_sorted, **kw))  # compile
        t0 = time.time()
        for _ in range(iters):
            p = sim.photometry_zsorted_device(th_sorted, **kw)
        jax.block_until_ready(p)
        zs_rate = batch / ((time.time() - t0) / iters)
        if sim._window_mega_supported():
            # fused window body: one Pallas program per sub-chunk.
            # Guarded: window sizes are runtime values, and an oversized
            # VMEM working set should degrade to "not reported", not kill
            # the bench
            try:
                jax.block_until_ready(sim.photometry_zsorted_device(
                    th_sorted, fused=True, **kw))
                t0 = time.time()
                for _ in range(iters):
                    p = sim.photometry_zsorted_device(
                        th_sorted, fused=True, **kw)
                jax.block_until_ready(p)
                zsf_rate = batch / ((time.time() - t0) / iters)
            except Exception as e:  # Mosaic VMEM/lowering failures
                print(f"# fused window skipped: {type(e).__name__}",
                      flush=True)
    return batch / dt, (zs_rate, zsf_rate), engine, sim._lam_support


def bench_training(n=100_000, batch=1024, epochs=3, fused_k=8):
    """Steady-state steps/sec of the whole-epoch lax.scan train step
    (the reference's tuned NSF config: hidden 69, 15 transforms). Times a
    warm jitted epoch directly so remote-compile latency isn't counted.

    Returns (single_dispatch_rate, fused_dispatch_rate): the second fuses
    `fused_k` epochs into ONE device program — the production path when
    TrainConfig.epochs_per_dispatch > 1. Training this small is dispatch-
    latency-bound (MFU 0.01%, BASELINE.md training anatomy), so fusing
    epochs is the main lever."""
    import optax

    rng = np.random.default_rng(1)
    theta = jnp.asarray(rng.standard_normal((n, 6)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((n, 14)), jnp.float32)
    flow = build_flow("nsf", 6, 14, hidden_features=69, num_transforms=15)
    params = flow.init(jax.random.PRNGKey(0), theta, x)
    tx = optax.chain(optax.clip_by_global_norm(5.0), optax.adamw(3e-4))
    opt = tx.init(params)
    steps = n // batch
    idx_all = jnp.arange(steps * batch).reshape(steps, batch)

    def one_epoch(params, opt):
        def step(c, bidx):
            p, s = c

            def loss(p):
                return -flow.log_prob(p, theta[bidx], x[bidx]).mean()

            l, g = jax.value_and_grad(loss)(p)
            u, s = tx.update(g, s, p)
            return (optax.apply_updates(p, u), s), l

        (p, s), ls = jax.lax.scan(step, (params, opt), idx_all)
        return p, s, ls.mean()

    epoch = jax.jit(one_epoch)

    @jax.jit
    def epoch_fused(params, opt):
        def e(c, _):
            p, s = c
            p, s, l = one_epoch(p, s)
            return (p, s), l

        (p, s), ls = jax.lax.scan(e, (params, opt), None, length=fused_k)
        return p, s, ls

    params, opt, l = epoch(params, opt)
    jax.block_until_ready(l)
    t0 = time.time()
    for _ in range(epochs):
        params, opt, l = epoch(params, opt)
    jax.block_until_ready(l)
    rate_single = epochs * steps / (time.time() - t0)

    p, o, ls = epoch_fused(params, opt)
    jax.block_until_ready(ls)
    t0 = time.time()
    for _ in range(epochs):
        p, o, ls = epoch_fused(params, opt)
    jax.block_until_ready(ls)
    rate_fused = epochs * fused_k * steps / (time.time() - t0)
    return rate_single, rate_fused


def bench_training_whole_run(n=100_000, batch=1024, e_short=40, e_long=240):
    """The production training path: `train_ensemble`'s whole-run
    single-dispatch program (member init + lax.while_loop over epochs with
    on-device early stop — ONE dispatch per run).

    Returns (steps_per_sec_sustained, steps_per_sec_e2e, warm_run_s):
    sustained differences two warm run lengths so the fixed per-call cost
    (trace on first call; the program cache makes repeats trace-free)
    cancels — the same methodology as the round-4 fitted asymptote;
    e2e divides the short run's steps by its full warm wall time."""
    from synference_tpu.train import TrainConfig, train_ensemble

    rng = np.random.default_rng(1)
    theta = jnp.asarray(rng.standard_normal((n, 6)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((n, 14)), jnp.float32)
    flow = build_flow("nsf", 6, 14, hidden_features=69, num_transforms=15)
    steps_per_epoch = int(n * 0.8) // batch

    warm = {}
    for e in (e_short, e_long):
        cfg = TrainConfig(max_epochs=e, stop_after_epochs=10_000,
                          batch_size=batch, learning_rate=3e-4)
        train_ensemble(flow, theta, x, jax.random.PRNGKey(0), cfg)  # compile
        t0 = time.time()
        train_ensemble(flow, theta, x, jax.random.PRNGKey(1), cfg)
        warm[e] = time.time() - t0
    sustained = (e_long - e_short) * steps_per_epoch / (
        warm[e_long] - warm[e_short])
    e2e = e_short * steps_per_epoch / warm[e_short]
    return sustained, e2e, warm[e_short]


def bench_sampling(n_objects=256, n_samples=1000):
    rng = np.random.default_rng(2)
    flow = build_flow("nsf", 6, 14, hidden_features=69, num_transforms=15)
    theta = jnp.asarray(rng.standard_normal((512, 6)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((512, 14)), jnp.float32)
    params = flow.init(jax.random.PRNGKey(0), theta, x)

    @jax.jit
    def draw(key, xs):
        keys = jax.random.split(key, xs.shape[0])
        return jax.vmap(
            lambda k, xi: flow.sample(params, k, xi, n_samples)
        )(keys, xs)

    xs = x[:n_objects]
    s = draw(jax.random.PRNGKey(1), xs)
    jax.block_until_ready(s)
    t0 = time.time()
    s = draw(jax.random.PRNGKey(2), xs)
    jax.block_until_ready(s)
    dt = time.time() - t0
    return n_objects * n_samples / dt


def main():
    seds_per_sec, (zs_h, zsf_h), eng_h, sup_h = bench_generation()
    # realistic grid size: a real BPASS/BC03 grid is ~[50-100] ages x [10+]
    # metallicities x ~1e4 λ points (VERDICT r1 #3) — bench that too
    # batch 65536: the per-call fixed cost through the axon tunnel is
    # ~5 ms (dispatch + arg staging; scripts/realsize_batch_ab.py), which
    # at batch 16384 was ~half the wall time — 65536 amortizes it
    # (1.59 -> 3.3 M SEDs/s measured)
    # sub=2048 measured fastest here (5.77 vs 5.45 M/s at 1024,
    # scripts/zsorted_hoist_ab.py session); paper63 below prefers 1024
    realsize_seds, (zs_r, zsf_r), eng_r, sup_r = bench_generation(
        batch=65536, iters=4, n_ages=64, n_mets=12, n_wav=10_000, sub=2048)
    # paper scale: the reference paper's 63-filter GENERAL_SURVEY config
    # (realistic measured-morphology curves, instruments.py) on the
    # realistic-size grid — photometry auto-selects the table-free conv
    # engine (the knot matrix would be ~400 MB of captured constants here)
    from synference_tpu.instruments import load_instrument_filters

    paper63_seds, (zs_p, zsf_p), eng_p, sup_p = bench_generation(
        batch=65536, iters=4, n_ages=64, n_mets=12, n_wav=10_000,
        filters=load_instrument_filters(), lam_min=150.0)
    train_steps, train_steps_fused = bench_training()
    train_sustained, train_e2e, train_warm_s = bench_training_whole_run()
    samples_per_sec = bench_sampling()

    def winner(unsorted, zs, zsf):
        best = max(unsorted, zs or 0.0, zsf or 0.0)
        return ("zsorted_fused" if best == (zsf or 0.0) and zsf
                else "zsorted" if best == (zs or 0.0) and zs
                else "unsorted")
    # headline = the library-generation path (z-sorted window engine when
    # supported — LibraryGenerator sorts its draws by redshift); the
    # unsorted single-batch rate is reported alongside
    headline = max(seds_per_sec, zs_h or 0.0, zsf_h or 0.0)
    out = {
        "metric": "mock_seds_per_sec",
        "value": round(headline, 1),
        "unit": ("SEDs/s (1 chip, 7 bands, batch 65536; fp32 pipeline, "
                 "bf16 knot-matmul photometry; z-sorted generation path)"),
        # the reference publishes no benchmark numbers; this ratio uses the
        # ESTIMATED 13.9 SEDs/s cluster rate derived in the module docstring
        "vs_baseline": round(headline / REF_SEDS_PER_SEC, 1),
        "vs_baseline_is_estimated": True,
        "headline_engine": f"{eng_h} support={sup_h}",
        "headline_unsorted_seds_per_sec": round(seds_per_sec, 1),
        "headline_zsorted_seds_per_sec": round(zs_h or 0.0, 1),
        "headline_zsorted_fused_seds_per_sec": round(zsf_h or 0.0, 1),
        # per-config engine winner — LibraryGenerator's zsorted_fused="auto"
        # micro-probe picks this at production time (VERDICT r4 item 8)
        "headline_winner": winner(seds_per_sec, zs_h, zsf_h),
        "realsize_seds_per_sec": round(
            max(realsize_seds, zs_r or 0.0, zsf_r or 0.0), 1),
        "realsize_unsorted_seds_per_sec": round(realsize_seds, 1),
        "realsize_zsorted_seds_per_sec": round(zs_r or 0.0, 1),
        "realsize_zsorted_fused_seds_per_sec": round(zsf_r or 0.0, 1),
        "realsize_grid": "64x12x10000 lambda, batch 65536",
        "realsize_engine": f"{eng_r} support={sup_r}",
        "realsize_winner": winner(realsize_seds, zs_r, zsf_r),
        "paper63_seds_per_sec": round(
            max(paper63_seds, zs_p or 0.0, zsf_p or 0.0), 1),
        "paper63_unsorted_seds_per_sec": round(paper63_seds, 1),
        "paper63_zsorted_seds_per_sec": round(zs_p or 0.0, 1),
        "paper63_zsorted_fused_seds_per_sec": round(zsf_p or 0.0, 1),
        "paper63_config": ("63 realistic survey filters "
                           "(VISTA+HSC+MegaCam+Euclid+HST+JWST+IRAC), "
                           "64x12x10000 lambda, batch 65536, windowed "
                           "conv engine / z-sorted window engine"),
        "paper63_engine": f"{eng_p} support={sup_p}",
        "paper63_winner": winner(paper63_seds, zs_p, zsf_p),
        # the production path: whole-run single-dispatch training
        # (train_ensemble's lax.while_loop program) — sustained differences
        # two warm run lengths so per-call fixed cost cancels
        "npe_train_steps_per_sec": round(train_sustained, 1),
        "npe_train_steps_per_sec_e2e_40_epochs": round(train_e2e, 1),
        "npe_train_whole_run_warm_s_40_epochs": round(train_warm_s, 2),
        "npe_train_steps_per_sec_single_dispatch": round(train_steps, 1),
        # TrainConfig.epochs_per_dispatch=8: the dispatch-latency floor
        # amortized over 8 whole epochs per device program
        "npe_train_steps_per_sec_fused_dispatch": round(train_steps_fused, 1),
        "posterior_samples_per_sec": round(samples_per_sec, 1),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
