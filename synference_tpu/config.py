"""Config-file-driven training, reference-schema compatible.

The reference trains from YAML configs (`SBICustomRunner.from_config`,
`/root/reference/src/synference/custom_runner.py:101-160`; e.g.
`examples/sbi/configs/best_params.yaml`):

    train_args:
      skip_optimization: True
      validation_fraction: 0.1
      fixed_params:
        model_choice: "nsf"
        learning_rate: 2.9e-4
        training_batch_size: 52
        stop_after_epochs: 47
        clip_max_norm: 4.78
        nsf_hidden_features: 69
        nsf_num_transforms: 15

`run_from_config` accepts that schema directly (including the `optuna:`
block routed to the native HPO study) plus native top-level keys:
`library` (HDF5 path), `features` (FeatureConfig kwargs), `engine`,
`n_nets`, `max_epochs`, `output` (save_state path).
"""

from __future__ import annotations

__all__ = ["load_config", "main", "run_from_config"]


def load_config(path: str) -> dict:
    """YAML or JSON config file -> dict."""
    text = open(path).read()
    if path.endswith(".json"):
        import json

        return json.loads(text)
    import yaml

    return yaml.safe_load(text)


def _model_kwargs_from_fixed(fixed: dict, model: str) -> dict:
    """Reference key style: '<model>_hidden_features' etc. -> kwargs."""
    out = {}
    prefix = model + "_"
    for k, v in fixed.items():
        if k.startswith(prefix):
            out[k[len(prefix):]] = v
        elif k in ("hidden_features", "num_transforms", "num_components",
                   "num_bins", "embedding_dim"):
            out[k] = v
    return out


def run_from_config(config, fitter=None):
    """Train per a reference-style config.

    Args:
        config: path to a YAML/JSON file, or the loaded dict.
        fitter: optional prebuilt `SBIFitter` (else `library` must name an
            HDF5 library to load).
    Returns:
        the trained fitter.
    """
    from .fitter import SBIFitter
    from .train import TrainConfig

    cfg = load_config(config) if isinstance(config, str) else dict(config)
    if fitter is None:
        lib = cfg.get("library")
        if not lib:
            raise ValueError("config needs a 'library' path (or pass fitter=)")
        fitter = SBIFitter.init_from_hdf5(lib)

    feat = cfg.get("features")
    if feat is not None:
        from .features import FeatureConfig

        feat = dict(feat)
        feat.setdefault("filter_codes", tuple(fitter.filter_codes))
        feat["filter_codes"] = tuple(feat["filter_codes"])
        for k in ("depths_ab",):
            if k in feat and isinstance(feat[k], list):
                feat[k] = tuple(feat[k])
        fitter.create_feature_array(FeatureConfig(**feat))

    ta = dict(cfg.get("train_args", {}))
    fixed = dict(ta.get("fixed_params", {}))
    model = str(fixed.get("model_choice", cfg.get("model_type", "nsf"))).lower()
    engine = str(cfg.get("engine", "npe")).lower()
    n_nets = int(cfg.get("n_nets", 1))
    max_epochs = int(cfg.get("max_epochs", ta.get("max_epochs", 100)))

    train_config = TrainConfig(
        learning_rate=float(fixed.get("learning_rate", 3e-4)),
        batch_size=int(fixed.get("training_batch_size",
                                 fixed.get("batch_size", 256))),
        stop_after_epochs=int(fixed.get("stop_after_epochs", 20)),
        clip_max_norm=float(fixed.get("clip_max_norm", 5.0)),
        max_epochs=max_epochs,
        validation_fraction=float(ta.get("validation_fraction", 0.1)),
        epochs_per_dispatch=int(ta.get("epochs_per_dispatch", 1)),
    )

    skip_opt = bool(ta.get("skip_optimization", True))
    if not skip_opt and "optuna" in ta:
        from .hpo import MedianPruner, optimize_sbi

        opt = dict(ta["optuna"])
        pruner_cfg = dict(opt.get("pruner", {}))
        pruner = MedianPruner(
            n_startup_trials=int(pruner_cfg.get("n_startup_trials", 5)),
            n_warmup_steps=int(pruner_cfg.get("n_warmup_steps", 3)),
        ) if str(pruner_cfg.get("type", "Median")).lower() == "median" \
            else None
        # optional explicit search space (the reference's custom_loop.yaml
        # declares parameter ranges in the config): YAML lists become the
        # ("int", lo, hi) / ("categorical", [..]) tuples SearchSpace takes
        space = opt.get("search_space")
        if space is not None:
            space = {k: tuple(v) if isinstance(v, (list, tuple)) else v
                     for k, v in dict(space).items()}
        study, best = optimize_sbi(
            fitter, model_type=model,
            search_space=space,
            n_trials=int(opt.get("n_trials", 20)),
            max_epochs=max_epochs,
            storage=(dict(opt.get("study", {})).get("storage") or None),
            pruner=pruner, verbose=bool(cfg.get("verbose", True)),
        )
        fitter.hpo_study = study
        # retrain the best configuration unless the config opts out
        if bool(opt.get("build_final_model", True)):
            best = dict(best)
            lr = best.pop("learning_rate", train_config.learning_rate)
            bs = best.pop("batch_size", train_config.batch_size)
            # "zoo" searches the family itself: retrain with the WINNING
            # model, not the meta-name (which build_flow would reject)
            final_model = best.pop("model_type", model)
            fitter.run_single_sbi(
                model_type=final_model, engine=engine, n_nets=n_nets,
                train_config=TrainConfig(
                    learning_rate=float(lr), batch_size=int(bs),
                    max_epochs=max_epochs,
                    stop_after_epochs=train_config.stop_after_epochs,
                ),
                **{k: v for k, v in best.items()
                   if not isinstance(v, (list, dict))},
            )
    else:
        fitter.run_single_sbi(
            model_type=model, engine=engine, n_nets=n_nets,
            train_config=train_config,
            **_model_kwargs_from_fixed(fixed, model),
        )

    out = cfg.get("output")
    if out:
        fitter.save_state(str(out))
    return fitter


def main(argv=None):
    """CLI: ``synference-tpu-train config.yaml`` — the counterpart of the
    reference's console entry point + YAML-config training flow
    (reference pyproject.toml:104-105, custom_runner.py:101-160)."""
    import argparse

    ap = argparse.ArgumentParser(
        prog="synference-tpu-train",
        description="Train an SBI model from a reference-style YAML/JSON "
                    "config (see synference_tpu.config).")
    ap.add_argument("config", help="path to the YAML/JSON config")
    args = ap.parse_args(argv)
    fitter = run_from_config(args.config)
    report = fitter.evaluate_model(n_samples=128, max_objects=128)
    print("TARP deviation:", report["tarp_deviation"])
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
