"""NPE training: whole-epoch fused steps, early stopping, vmapped ensembles.

Replaces the reference's torch training loop (`SBICustomRunner._train_model`,
`/root/reference/src/synference/custom_runner.py:531-742`, defaults
`sbi_runner.py:4404-4409`: batch 64, lr 1e-4, val 0.2, patience 15ish,
clip 5.0). TPU-first differences:

- The full dataset lives in HBM; one epoch = one `lax.scan` over shuffled
  minibatches inside a single jitted program (no host<->device ping-pong).
- Ensembles train as ONE program: member parameters are stacked and the
  epoch function is vmapped across them — n_nets flows for the compile cost
  of one (the reference trains members serially, sbi_runner.py:4805-4901).
- Early stopping/best-restore bookkeeping stays host-side per epoch.

Checkpoint/resume: `save_checkpoint`/`load_checkpoint` persist params +
optimizer state + epoch + RNG every `checkpoint_every` epochs (the analogue
of the reference's `checkpoint_posterior.pt` every 10 epochs,
custom_runner.py:691-706).
"""

from __future__ import annotations

import os
import pickle
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .flows.base import ConditionalFlow

__all__ = ["TrainConfig", "train_npe", "train_ensemble", "TrainResult"]


@dataclass
class TrainConfig:
    batch_size: int = 256
    learning_rate: float = 1.0e-4
    max_epochs: int = 500
    stop_after_epochs: int = 20  # early-stop patience on val loss
    validation_fraction: float = 0.2
    clip_max_norm: float = 5.0
    weight_decay: float = 0.0
    checkpoint_path: str | None = None
    checkpoint_every: int = 10
    # epochs fused into ONE device dispatch (lax.scan over whole epochs).
    # Training this small is dispatch-latency-bound on a remote-attached
    # TPU (measured MFU 0.01%, BASELINE.md "training anatomy"): 4 epochs
    # per dispatch is +35% steps/s. Early-stop/pruning/checkpoint checks
    # happen every `epochs_per_dispatch` epochs, and the total epoch count
    # rounds up to a multiple of it (best-val tracking stays per-epoch on
    # device, so the extra epochs never degrade the returned params).
    epochs_per_dispatch: int = 1
    # Run the ENTIRE training loop as ONE device program: a lax.while_loop
    # over epochs carrying params/optimizer/best-val/early-stop state, so an
    # NSF-69x15 run costs a single dispatch instead of max_epochs /
    # epochs_per_dispatch of them (the ~13.7 ms/dispatch fixed cost measured
    # in BASELINE.md "training anatomy" vanishes; early stopping happens on
    # device at per-epoch granularity). None = auto: used whenever no
    # host-side per-epoch feature is requested (epoch_callback, live_plot,
    # checkpointing). Explicit True is still ignored when one of those
    # features forces the host loop. The reference's analogue is the
    # explicit torch epoch loop, custom_runner.py:531-742.
    whole_run: bool | None = None
    # "pickle" (host round-trip, single-process) or "orbax": orbax writes
    # each shard of mesh-sharded params/opt state from its own host with no
    # device->host gather — the multi-host checkpoint path SURVEY §5
    # prescribes (the reference's torch checkpoint is single-device,
    # custom_runner.py:691-706). checkpoint_path is a DIRECTORY for orbax.
    checkpoint_backend: str = "pickle"
    # live in-terminal loss chart per epoch (reference utils.py:2445-2546);
    # degrades to one summary line per epoch on non-TTY streams
    live_plot: bool = False


@dataclass
class TrainResult:
    params: dict  # best-val params (stacked over members for ensembles)
    train_losses: np.ndarray  # (epochs,) or (epochs, n_nets)
    val_losses: np.ndarray
    best_epoch: int
    n_members: int = 1
    history: dict = field(default_factory=dict)


def _make_optimizer(cfg: TrainConfig, traced_lr: bool = False):
    if traced_lr:
        # learning rate lives in the optimizer STATE (a traced array) rather
        # than the program, so members of a vmapped ensemble can each train
        # at their own lr inside one compiled program
        adamw = optax.inject_hyperparams(optax.adamw)(
            learning_rate=cfg.learning_rate, weight_decay=cfg.weight_decay)
    else:
        adamw = optax.adamw(cfg.learning_rate, weight_decay=cfg.weight_decay)
    if cfg.clip_max_norm and cfg.clip_max_norm > 0:
        return optax.chain(
            optax.clip_by_global_norm(cfg.clip_max_norm), adamw)
    return adamw


def _set_member_lrs(opt_state, cfg: TrainConfig, lrs):
    """Overwrite the injected learning_rate hyperparam (one per member)."""
    if cfg.clip_max_norm and cfg.clip_max_norm > 0:
        clip_s, inj_s = opt_state
        inj_s = inj_s._replace(
            hyperparams={**inj_s.hyperparams, "learning_rate": lrs})
        return (clip_s, inj_s)
    return opt_state._replace(
        hyperparams={**opt_state.hyperparams, "learning_rate": lrs})


def _split_data(theta, x, cfg, key, groups=None):
    """Train/val split; with `groups` (per-row source-galaxy ids, e.g. from
    FeatureResult.source_index) all copies of a galaxy land on one side —
    scatter-duplicated rows otherwise leak θ across the split."""
    n = theta.shape[0]
    if groups is None:
        perm = jax.random.permutation(key, n)
        n_val = max(int(n * cfg.validation_fraction), 1)
        val_idx, train_idx = perm[:n_val], perm[n_val:]
    else:
        groups = np.asarray(groups)
        uniq = np.unique(groups)
        rng = np.random.default_rng(
            int(jax.random.randint(key, (), 0, 2**31 - 1))
        )
        perm_g = rng.permutation(len(uniq))
        n_val_g = max(int(len(uniq) * cfg.validation_fraction), 1)
        val_groups = set(uniq[perm_g[:n_val_g]].tolist())
        is_val = np.isin(groups, list(val_groups))
        val_idx = jnp.asarray(np.where(is_val)[0])
        train_idx = jnp.asarray(np.where(~is_val)[0])
    return (theta[train_idx], x[train_idx]), (theta[val_idx], x[val_idx])


def _make_epoch_all_body(loss_fn, tx, n_nets, n_train, bs, steps_per_epoch):
    """Build the one-epoch-for-all-members body used by both training
    paths (host loop and whole-run while_loop).

    Best-params selection happens on device: doing it host-side costs one
    dispatch per parameter leaf per epoch, which dominates wall clock on
    remote-attached TPUs. The dataset rides in as an ARGUMENT (broadcast
    across the member vmap), never a closure: closed-over arrays become
    HLO constants, and an 80 MB constant blob both bloats the axon
    remote-compile request and slows XLA constant processing (the
    north-star's 1e6-row epoch program compiled minutes slower that way).
    """

    def epoch_one_member(params, opt_state, perm_key, data):
        """One member, one epoch: scan over shuffled minibatches."""
        d_t_tr, d_x_tr, d_t_va, d_x_va = data
        perm = jax.random.permutation(perm_key, n_train)
        idx = perm[: steps_per_epoch * bs].reshape(steps_per_epoch, bs)

        def step(carry, batch_idx):
            p, s = carry
            tb, xb = d_t_tr[batch_idx], d_x_tr[batch_idx]
            l, g = jax.value_and_grad(loss_fn)(p, tb, xb)
            updates, s = tx.update(g, s, p)
            p = optax.apply_updates(p, updates)
            return (p, s), l

        (params, opt_state), losses = jax.lax.scan(
            step, (params, opt_state), idx
        )
        val_loss = loss_fn(params, d_t_va, d_x_va)
        return params, opt_state, losses.mean(), val_loss

    def epoch_all_body(params, opt_state, key, best_params, best_val,
                       since_best, data):
        """One epoch for every member + device-side best-val tracking."""
        keys = jax.random.split(key, n_nets)
        if n_nets == 1:
            # skip the member vmap: a unit-batched program costs a real
            # +9.4 ms/epoch on v5e (measured, scripts/whole_run_gap_ab.py
            # — batched gathers/permutation lower differently), i.e. 1.4x
            # on the single-flow marginal rate. Leading-axis squeezes are
            # metadata-only.
            squeeze = jax.tree_util.tree_map
            p1, s1, tr, va = epoch_one_member(
                squeeze(lambda a: a[0], params),
                squeeze(lambda a: a[0], opt_state), keys[0], data)
            params = squeeze(lambda a: a[None], p1)
            opt_state = squeeze(lambda a: a[None], s1)
            tr_loss, va_loss = tr[None], va[None]
        else:
            params, opt_state, tr_loss, va_loss = jax.vmap(
                epoch_one_member, in_axes=(0, 0, 0, None)
            )(params, opt_state, keys, data)
        improved = va_loss < best_val

        def pick(new, old):
            m = improved.reshape((n_nets,) + (1,) * (new.ndim - 1))
            return jnp.where(m, new, old)

        best_params = jax.tree_util.tree_map(pick, params, best_params)
        best_val = jnp.where(improved, va_loss, best_val)
        since_best = jnp.where(improved, 0, since_best + 1)
        return (params, opt_state, tr_loss, va_loss, best_params, best_val,
                since_best)

    return epoch_all_body


# Cache of compiled whole-run programs keyed by (flow spec, loss id,
# statics): HPO loops and seed sweeps call train_ensemble repeatedly on
# identical shapes, and retracing the scan-in-while flow graph costs seconds
# per call. Keying by the flow's canonicalized `spec()` (not object id) lets
# trials that rebuild an identical architecture share one traced program —
# `from_spec` round-trips prove the spec fully determines the computation.
# Values hold strong refs to (fn, flow, loss) so ids stay valid while cached.
_WHOLE_RUN_CACHE: dict = {}


def _canon_spec(v):
    """Hashable, full-precision canonical form of a flow spec value (plain
    repr truncates arrays and rounds floats — collisions would silently
    reuse a program compiled for different support bounds)."""
    if isinstance(v, (np.ndarray, jnp.ndarray)):
        return ("arr", tuple(v.shape),
                tuple(np.asarray(v, np.float64).ravel().tolist()))
    if isinstance(v, (list, tuple)):
        return tuple(_canon_spec(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _canon_spec(x)) for k, x in v.items()))
    return v


def _flow_cache_key(flow):
    spec = getattr(flow, "spec", None)
    if spec is None:
        return id(flow)
    try:
        return _canon_spec(spec())
    except TypeError:  # unhashable/unknown content: fall back to identity
        return id(flow)


def _build_whole_run_fn(init_members, epoch_all_body, n_nets, max_e,
                        patience):
    """The ENTIRE training run as one device program: member init, then a
    while_loop over epochs with on-device early stopping and best-params
    tracking. Loss history is written into fixed (max_epochs, n_nets)
    buffers (NaN beyond the stopping epoch); ONE dispatch and one readback
    for the whole run."""

    @jax.jit
    def whole_run_fn(m_keys, key, data, member_lrs):
        params, opt_state = init_members(m_keys, data[0], data[1],
                                         member_lrs)
        tr_hist = jnp.full((max_e, n_nets), jnp.nan, jnp.float32)
        va_hist = jnp.full((max_e, n_nets), jnp.nan, jnp.float32)
        init = (jnp.int32(0), params, opt_state, key, params,
                jnp.full((n_nets,), jnp.inf, jnp.float32),
                jnp.zeros((n_nets,), jnp.int32), tr_hist, va_hist)

        def cond(carry):
            e, _p, _s, _k, _bp, _bv, sb, _t, _v = carry
            return (e < max_e) & jnp.logical_not(jnp.all(sb >= patience))

        def body(carry):
            e, p, s, k, bp, bv, sb, trh, vah = carry
            k, ke = jax.random.split(k)
            p, s, tr, va, bp, bv, sb = epoch_all_body(
                p, s, ke, bp, bv, sb, data)
            trh = jax.lax.dynamic_update_index_in_dim(trh, tr, e, 0)
            vah = jax.lax.dynamic_update_index_in_dim(vah, va, e, 0)
            return (e + 1, p, s, k, bp, bv, sb, trh, vah)

        e, _p, _s, _k, bp, bv, _sb, trh, vah = jax.lax.while_loop(
            cond, body, init)
        return e, bp, bv, trh, vah

    return whole_run_fn


def train_npe(
    flow: ConditionalFlow,
    theta,
    x,
    key=None,
    config: TrainConfig | None = None,
    resume: bool = True,
    groups=None,
) -> TrainResult:
    """Train a single NPE flow with -E[log q(θ|x)] loss."""
    result = train_ensemble(flow, theta, x, key=key, config=config,
                            n_nets=1, resume=resume, groups=groups)
    # unstack the singleton member axis
    result.params = jax.tree_util.tree_map(lambda a: a[0], result.params)
    result.train_losses = result.train_losses[:, 0]
    result.val_losses = result.val_losses[:, 0]
    return result


def train_ensemble(
    flow: ConditionalFlow,
    theta,
    x,
    key=None,
    config: TrainConfig | None = None,
    n_nets: int = 1,
    resume: bool = True,
    groups=None,
    loss_fn=None,
    epoch_callback=None,
    member_learning_rates=None,
) -> TrainResult:
    """Train n_nets flows simultaneously (vmapped over the member axis).

    Returns stacked params with leading member axis; `val_losses` has shape
    (epochs, n_nets). Early stopping is per-member best tracking; training
    stops when every member's patience is exhausted.

    Args:
        loss_fn: optional (params, theta_batch, x_batch) -> scalar replacing
            the default NPE loss -E[log q(θ|x)] (used by the NRE engine;
            `flow` then only needs an `init(key, theta, x)` method).
        epoch_callback: optional (epoch, train_loss (n_nets,), val_loss
            (n_nets,)) -> bool called after every epoch; returning True
            aborts training (mid-run HPO pruning, the reference prunes
            during training via Optuna callbacks, custom_runner.py:662-670).
            An abort restores best-so-far params and marks
            `history["pruned"] = True`. Pruning GRANULARITY is
            `epochs_per_dispatch`: with K > 1 a prune signal at epoch j
            inside a fused block takes effect after the block, so up to
            K-1 extra epochs run — benign for the returned params (best-val
            tracking is per-epoch on device) but the extra epochs do train.
            Use K=1 if exact per-epoch prune semantics matter.
        member_learning_rates: optional (n_nets,) per-member learning rates
            (overrides config.learning_rate). The lr is injected into the
            optimizer state, so K learning-rate trials train as ONE vmapped
            program — the TPU-native form of HPO lr search (the reference
            runs each Optuna lr trial as its own torch loop,
            custom_runner.py:744-968). See `hpo.sweep_learning_rates`.
    """
    cfg = config or TrainConfig()
    key = key if key is not None else jax.random.PRNGKey(0)
    theta = jnp.asarray(theta, jnp.float32)
    x = jnp.asarray(x, jnp.float32)
    if theta.ndim == 1:
        theta = theta[:, None]

    k_split, k_init, k_loop = jax.random.split(key, 3)
    (t_tr, x_tr), (t_va, x_va) = _split_data(theta, x, cfg, k_split, groups)
    n_train = t_tr.shape[0]
    bs = min(cfg.batch_size, n_train)
    steps_per_epoch = max(n_train // bs, 1)

    member_keys = jax.random.split(k_init, n_nets)
    # whole-run decided up front: that path ALWAYS injects the lr into the
    # optimizer state (a traced argument), so lr-only HPO trials reuse one
    # compiled+traced program instead of retracing per learning rate
    use_whole_run = cfg.whole_run if cfg.whole_run is not None else True
    use_whole_run = (use_whole_run and epoch_callback is None
                     and not cfg.live_plot and cfg.checkpoint_path is None)
    traced_lr = (member_learning_rates is not None) or use_whole_run
    tx = _make_optimizer(cfg, traced_lr=traced_lr)
    if member_learning_rates is not None:
        lrs = jnp.asarray(member_learning_rates, jnp.float32)
        if lrs.shape != (n_nets,):
            raise ValueError(
                f"member_learning_rates must have shape ({n_nets},), "
                f"got {lrs.shape}")
    elif traced_lr:
        lrs = jnp.full((n_nets,), cfg.learning_rate, jnp.float32)
    else:
        lrs = None

    def init_members(m_keys, d_t_tr, d_x_tr, member_lrs):
        """Stacked member params + optimizer state. Called inside a jitted
        program: eager (op-by-op) init of an NSF-69x15 dispatches hundreds
        of tiny ops through the tunnel at ~3 ms each — seconds of pure
        launch latency per train call. `member_lrs` is a traced ARGUMENT
        (not a closure) so the cached whole-run program stays correct
        across lr-sweep calls; ignored unless member_learning_rates was
        given."""
        p = jax.vmap(lambda k: flow.init(k, d_t_tr, d_x_tr))(m_keys)
        s = jax.vmap(tx.init)(p)
        if traced_lr:
            s = _set_member_lrs(s, cfg, member_lrs)
        return p, s

    lrs_arg = lrs if traced_lr else jnp.zeros((n_nets,), jnp.float32)

    user_loss = loss_fn
    if loss_fn is None:
        def loss_fn(p, tb, xb):
            return -flow.log_prob(p, tb, xb).mean()

    epoch_all_body = _make_epoch_all_body(
        loss_fn, tx, n_nets, n_train, bs, steps_per_epoch)

    # ---- whole-run single-dispatch path (device-resident early stop) -----
    if use_whole_run:
        max_e = int(cfg.max_epochs)
        patience = int(cfg.stop_after_epochs)
        # the compiled whole-run program is cached across train_ensemble
        # calls (HPO loops/sweeps call this repeatedly): retracing the
        # scan-in-while NSF graph costs seconds per call otherwise. Keyed
        # by the flow/loss identities (strong refs held, so ids stay valid
        # while cached) + every static baked into the closure.
        cache_key = (
            _flow_cache_key(flow),
            None if user_loss is None else id(user_loss),
            n_nets, max_e, patience, bs, n_train, steps_per_epoch,
            t_tr.shape, x_tr.shape, traced_lr,
            # learning_rate intentionally NOT in the key: it rides in the
            # optimizer state as a traced argument on this path
            float(cfg.weight_decay), float(cfg.clip_max_norm or 0.0),
        )
        cached = _WHOLE_RUN_CACHE.get(cache_key)
        if cached is None:
            whole_run_fn = _build_whole_run_fn(
                init_members, epoch_all_body, n_nets, max_e, patience)
            if len(_WHOLE_RUN_CACHE) >= 8:
                _WHOLE_RUN_CACHE.pop(next(iter(_WHOLE_RUN_CACHE)))
            # hold refs to flow/loss so their ids cannot be reused while
            # this entry is alive
            _WHOLE_RUN_CACHE[cache_key] = (whole_run_fn, flow, user_loss)
        else:
            whole_run_fn = cached[0]

        n_run, best_params, best_val, trh, vah = whole_run_fn(
            member_keys, k_loop, (t_tr, x_tr, t_va, x_va), lrs_arg)
        n_run = int(n_run)
        tr_arr = np.asarray(trh)[:n_run]
        val_arr = np.asarray(vah)[:n_run]
        best_val = np.asarray(best_val)
        return TrainResult(
            params=best_params,
            train_losses=tr_arr,
            val_losses=val_arr,
            best_epoch=(int(np.argmin(val_arr.mean(axis=1)))
                        if len(val_arr) else 0),
            n_members=n_nets,
            history={
                "best_val": best_val.tolist(),
                "pruned": False,
                "whole_run": True,
                **({"member_learning_rates":
                    np.asarray(member_learning_rates, np.float64).tolist()}
                   if member_learning_rates is not None else {}),
            },
        )

    params, opt_state = jax.jit(init_members)(member_keys, t_tr, x_tr,
                                              lrs_arg)

    k_dispatch = max(int(cfg.epochs_per_dispatch), 1)

    @jax.jit
    def epoch_all(params, opt_state, key, best_params, best_val, since_best,
                  data):
        """`epochs_per_dispatch` whole epochs fused into one device program
        (a lax.scan over epoch_all_body) — amortizes the per-dispatch
        latency floor that dominates small-flow training (BASELINE.md
        "training anatomy": 2449 -> 3312 steps/s at 4 epochs/dispatch)."""
        def body(carry, k_epoch):
            p, s, bp, bv, sb = carry
            p, s, tr, va, bp, bv, sb = epoch_all_body(
                p, s, k_epoch, bp, bv, sb, data)
            return (p, s, bp, bv, sb), (tr, va)

        keys = jax.random.split(key, k_dispatch)
        (params, opt_state, best_params, best_val, since_best), (trs, vas) = (
            jax.lax.scan(
                body, (params, opt_state, best_params, best_val, since_best),
                keys))
        return (params, opt_state, trs, vas, best_params, best_val,
                since_best)

    # ---- host-side epoch loop with early stopping + checkpointing --------
    start_epoch = 0
    pruned = False
    best_val = jnp.full(n_nets, jnp.inf)
    best_params = params
    epochs_since_best = jnp.zeros(n_nets, dtype=jnp.int32)
    train_hist, val_hist = [], []

    live = None
    if cfg.live_plot:
        from .runtime import TerminalLossPlot

        live = TerminalLossPlot(label=f"npe x{n_nets}")

    ckpt = cfg.checkpoint_path
    backend = cfg.checkpoint_backend

    def _ckpt_state(epoch_done):
        hist_t, hist_v = train_hist, val_hist
        if backend == "orbax":  # orbax wants arrays, not python lists
            hist_t = (np.stack(hist_t) if hist_t
                      else np.zeros((0, n_nets), np.float32))
            hist_v = (np.stack(hist_v) if hist_v
                      else np.zeros((0, n_nets), np.float32))
        return {
            "params": params, "opt_state": opt_state,
            "best_params": best_params,
            "best_val": np.asarray(best_val),
            "epoch": (np.asarray(epoch_done) if backend == "orbax"
                      else epoch_done),
            "epochs_since_best": np.asarray(epochs_since_best),
            "train_hist": hist_t, "val_hist": hist_v,
            "key": k_loop,
        }

    if ckpt and resume and os.path.exists(ckpt):
        state = load_checkpoint(
            ckpt, backend=backend,
            template=_ckpt_state(0) if backend == "orbax" else None)
        params, opt_state = state["params"], state["opt_state"]
        best_params = state["best_params"]
        best_val = jnp.asarray(state["best_val"])
        start_epoch = int(state["epoch"]) + 1
        epochs_since_best = jnp.asarray(state["epochs_since_best"])
        train_hist = [np.asarray(r) for r in state["train_hist"]]
        val_hist = [np.asarray(r) for r in state["val_hist"]]
        k_loop = jnp.asarray(state["key"])

    epoch = start_epoch
    while epoch < cfg.max_epochs:
        k_loop, k_epoch = jax.random.split(k_loop)
        (params, opt_state, tr_block, va_block, best_params, best_val,
         epochs_since_best) = epoch_all(
            params, opt_state, k_epoch, best_params, best_val,
            epochs_since_best, (t_tr, x_tr, t_va, x_va),
        )
        # ONE readback per dispatch: (k_dispatch, n_nets) loss blocks
        tr_block, va_block = np.asarray(tr_block), np.asarray(va_block)
        for j in range(k_dispatch):
            train_hist.append(tr_block[j])
            val_hist.append(va_block[j])
            if live is not None:
                live.update(epoch + j, tr_block[j], va_block[j])
            if epoch_callback is not None and bool(
                epoch_callback(epoch + j, tr_block[j], va_block[j])
            ):
                pruned = True
                break
        epoch += k_dispatch
        if pruned:
            break

        if ckpt and (epoch // cfg.checkpoint_every
                     > (epoch - k_dispatch) // cfg.checkpoint_every):
            save_checkpoint(ckpt, _ckpt_state(epoch - 1), backend=backend)

        if bool((np.asarray(epochs_since_best)
                 >= cfg.stop_after_epochs).all()):
            break
    best_val = np.asarray(best_val)

    if ckpt and os.path.exists(ckpt):
        # success: drop the checkpoint (reference does the same). Only the
        # orbax backend owns a DIRECTORY; under the pickle backend a
        # directory at checkpoint_path is a user mistake (e.g. pointed at
        # pre-existing data) and os.remove raising is the right outcome —
        # never rmtree a directory this run didn't write.
        if backend == "orbax" and os.path.isdir(ckpt):
            import shutil

            shutil.rmtree(ckpt)
        else:
            os.remove(ckpt)

    val_arr = np.stack(val_hist) if val_hist else np.zeros((0, n_nets))
    tr_arr = np.stack(train_hist) if train_hist else np.zeros((0, n_nets))
    return TrainResult(
        params=best_params,
        train_losses=tr_arr,
        val_losses=val_arr,
        best_epoch=int(np.argmin(val_arr.mean(axis=1))) if len(val_arr) else 0,
        n_members=n_nets,
        history={
            "best_val": best_val.tolist(),
            "pruned": pruned,
            **({"member_learning_rates":
                np.asarray(member_learning_rates, np.float64).tolist()}
               if member_learning_rates is not None else {}),
        },
    )


# ---------------------------------------------------------------------------
# checkpointing
# ---------------------------------------------------------------------------


def save_checkpoint(path: str, state: dict, backend: str = "pickle") -> None:
    """Atomically persist a training-state pytree.

    backend="pickle": host-copy everything into one file (single-process).
    backend="orbax": `path` is a directory; device (including mesh-sharded)
    arrays are written shard-local with no host gather — use this on
    multi-host meshes where gathering params would not fit one host.
    """
    if backend == "orbax":
        import shutil

        import orbax.checkpoint as ocp

        def _orbax_safe(leaf):
            # single-device / replicated arrays are host-copied first: the
            # experimental axon tunnel runtime hangs inside tensorstore's
            # device serialization (measured: a 16 KB array stuck >5 min),
            # and for unsharded leaves the host copy is what pickle would
            # do anyway. Mesh-SHARDED arrays keep the shard-local
            # tensorstore path — the reason this backend exists.
            if isinstance(leaf, jax.Array) and len(leaf.devices()) == 1:
                return np.asarray(leaf)
            return leaf

        state = jax.tree_util.tree_map(_orbax_safe, state)
        tmp = path + ".tmp-new"
        if os.path.isdir(tmp):
            shutil.rmtree(tmp)
        with ocp.PyTreeCheckpointer() as ckpt:
            ckpt.save(os.path.abspath(tmp), state)
        if os.path.isdir(path):
            shutil.rmtree(path)
        os.replace(tmp, path)
        return
    host_state = jax.tree_util.tree_map(
        lambda a: np.asarray(a) if isinstance(a, jnp.ndarray) else a, state
    )
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(host_state, f)
    os.replace(tmp, path)


def load_checkpoint(path: str, backend: str = "pickle",
                    template: dict | None = None) -> dict:
    """Inverse of `save_checkpoint`.

    For orbax, pass `template` — a state dict with the SAME tree structure
    (fresh params/optimizer state work; array shapes need not match) —
    so container types (optax NamedTuple states) are restored exactly:
    orbax returns plain tuples for namedtuples, so the result is
    re-unflattened against the template's treedef.
    """
    if backend == "orbax":
        import orbax.checkpoint as ocp

        with ocp.PyTreeCheckpointer() as ckpt:
            restored = (ckpt.restore(os.path.abspath(path), item=template)
                        if template is not None
                        else ckpt.restore(os.path.abspath(path)))
        if template is not None:
            return jax.tree_util.tree_unflatten(
                jax.tree_util.tree_structure(template),
                jax.tree_util.tree_leaves(restored))
        return restored
    with open(path, "rb") as f:
        return pickle.load(f)
