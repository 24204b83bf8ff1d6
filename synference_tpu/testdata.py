"""Local test-asset generation CLI.

The reference ships `synference-download-data`, which fetches a small
prebuilt SBI test library over the network
(`/root/reference/src/synference/utils.py:2789-2806`, console entry
`pyproject.toml:104-105`), and its test suite downloads Synthesizer's
official test SPS grid (`tests/conftest.py:57-70`). This environment has no
network, and the TPU build's simulator is fast enough that downloading is
pointless anyway: `synference-tpu-testdata` GENERATES the same two assets
locally in a few seconds —

- a small synthetic SPS grid HDF5 (real multi-axis layout),
- a small mock library HDF5 in the reference schema (the parity interface,
  reference `library.py:4074-4153`), produced by the batch simulator.

Usage: `synference-tpu-testdata [--out DIR] [--n 2000] [--seed 0]`
"""

from __future__ import annotations

import argparse
import os


def generate_test_data(out_dir: str, n: int = 2000, seed: int = 0,
                       verbose: bool = True) -> dict:
    """Write `test_grid.hdf5` + `sbi_test_library.hdf5` under `out_dir`.

    Returns {"grid": path, "library": path}.
    """
    from .filters import FilterSet, tophat_filter
    from .grids import make_synthetic_grid
    from .library import LibraryGenerator
    from .sed import BatchSEDSimulator, EmissionConfig

    os.makedirs(out_dir, exist_ok=True)
    grid_path = os.path.join(out_dir, "test_grid.hdf5")
    lib_path = os.path.join(out_dir, "sbi_test_library.hdf5")

    grid = make_synthetic_grid(n_ages=32, n_mets=5, n_wav=1024, seed=0)
    grid.to_hdf5(grid_path)
    if verbose:
        print(f"wrote {grid_path} "
              f"({grid.n_ages}x{grid.n_mets}x{grid.n_wav})", flush=True)

    centers = [9000.0, 11500.0, 15000.0, 20000.0, 27700.0, 35600.0, 44400.0]
    widths = [2000.0, 2600.0, 3300.0, 4600.0, 7000.0, 7800.0, 10200.0]
    codes = ["JWST/NIRCam.F090W", "JWST/NIRCam.F115W", "JWST/NIRCam.F150W",
             "JWST/NIRCam.F200W", "JWST/NIRCam.F277W", "JWST/NIRCam.F356W",
             "JWST/NIRCam.F444W"]
    filters = FilterSet([
        tophat_filter(code, c, w)
        for code, c, w in zip(codes, centers, widths)
    ])
    sim = BatchSEDSimulator(
        grid=grid, filters=filters,
        param_names=("log10_mass", "redshift", "peak_age", "tau",
                     "log10_metallicity", "tau_v"),
        sfh="lognormal", zdist="delta",
        emission=EmissionConfig(igm="inoue14"),
    )
    gen = LibraryGenerator(sim, {
        "log10_mass": (7.5, 11.0), "redshift": (0.1, 8.0),
        "log10_peak_age": (7.6, 9.2), "tau": (0.1, 1.2),
        "log10_metallicity": (-3.9, -1.6), "tau_v": (0.0, 2.0),
    }, unlog_keys=["log10_peak_age"])
    gen.generate(n=n, seed=seed, out_path=lib_path)
    if verbose:
        print(f"wrote {lib_path} ({n} SEDs x {len(filters)} bands)",
              flush=True)
    return {"grid": grid_path, "library": lib_path}


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        prog="synference-tpu-testdata",
        description=__doc__.splitlines()[0])
    ap.add_argument("--out", default="synference_tpu_test_data",
                    help="output directory (created if absent)")
    ap.add_argument("--n", type=int, default=2000,
                    help="number of mock SEDs in the test library")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)
    generate_test_data(args.out, n=args.n, seed=args.seed)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
