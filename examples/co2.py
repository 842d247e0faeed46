"""Mauna Loa CO2: composite kernel, BO over the 11-D hyperparameter space,
20-year extrapolation, and the reference's four-acquisition comparison.

[ref: CO2_example.py:404-423 (__main__): load Mauna Loa, mean-center,
tune_hyperparameters_BO (:330-379 — 10 iters x 500 candidates per
acquisition, compared against the book hyperparams theta_book at :324),
make_prediction 20-year monthly grid (:182-214,408) and plot (:382-401)].

Differences: the vendored CSV is the real NOAA-anchored series (quirk Q7;
see data/make_mauna_loa.py), all four acquisitions genuinely dispatch
(quirk Q5 fixed — the reference's dispatcher always falls through to PI,
so its four plotted "acquisition" curves differ only by RNG), and the LML
uses the corrected formula (quirk Q1).

Precision: this workload is tiny (n=526) but ill-conditioned (book
amplitudes ~66 put K's diagonal at ~4.4e3; kappa ~ 1e7), so the pipeline
runs in float64 on the host CPU backend — f32 LML shifts by O(100) here.
The TPU earns its keep on the large-n benches, not on 526 points.

Run:
  python examples/co2.py                        # BO with one acquisition
  python examples/co2.py --compare-acquisitions # the reference's 4-way run
  (defaults are scaled down so the demo finishes in minutes; pass
  --bo-iters 10 --candidates 500 for the reference's full search)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse

import jax

jax.config.update("jax_enable_x64", True)
try:  # prefer the CPU backend for this f64 workload (axon TPU has no fast f64)
    _CPU = jax.devices("cpu")[0]
except RuntimeError:
    _CPU = jax.devices()[0]

import jax.numpy as jnp
import numpy as np

from gaussian_process_tpu import gp, ops
from gaussian_process_tpu.opt import tune_bayesian_opt
from gaussian_process_tpu.utils import datasets, plotting
from gaussian_process_tpu.utils.logging import JsonlLogger

# GPML sec. 5.4.3 book hyperparameters [ref: CO2_example.py:324]
THETA_BOOK = np.array([66.0, 67.0, 2.4, 90.0, 1.3, 0.66, 1.2, 0.78, 0.18, 1.6, 0.19])

ACQUISITIONS = ["PI", "EI", "UCB", "TS"]  # all four, really [ref: CO2_example.py:341]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--bo-iters", type=int, default=5)
    ap.add_argument("--candidates", type=int, default=100)
    ap.add_argument("--acquisition", choices=ACQUISITIONS, default="PI")
    ap.add_argument("--compare-acquisitions", action="store_true",
                    help="run all four acquisitions and emit the comparison "
                         "artifact [ref: CO2_example.py:330-379]")
    ap.add_argument("--years", type=int, default=20)
    ap.add_argument("--skip-bo", action="store_true", help="just fit at the book values")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="artifacts/co2")
    args = ap.parse_args()

    x_np, y_np, y_mean = datasets.mauna_loa()
    with jax.default_device(_CPU):
        x = jnp.asarray(x_np, jnp.float64)
        y = jnp.asarray(y_np, jnp.float64)
    kernel = ops.co2_kernel()

    def lml_at(theta: np.ndarray) -> float:
        with jax.default_device(_CPU):
            params = ops.co2_params_from_vector(jnp.asarray(theta, jnp.float64))
            return float(
                gp.log_marginal_likelihood(kernel, params, x, y, noise_variance=5e-4)
            )

    lml_book = lml_at(THETA_BOOK)
    os.makedirs(args.out, exist_ok=True)
    log = JsonlLogger(os.path.join(args.out, "run.jsonl"))
    log.log("book_lml", theta=THETA_BOOK, lml=lml_book)
    print(f"LML at book hyperparams: {lml_book:.4f}")

    # book-anchored candidate box [ref: CO2_example.py:109-128
    # (random_sample_test_parms draws around the book values)]
    lo = np.maximum(THETA_BOOK * 0.5, 1e-3)
    hi = THETA_BOOK * 1.5

    theta_best = THETA_BOOK
    best_lml = lml_book
    if not args.skip_bo:
        runs = ACQUISITIONS if args.compare_acquisitions else [args.acquisition]
        results = {}
        for acq in runs:
            bo = tune_bayesian_opt(
                lml_at,
                initial_points=THETA_BOOK[None, :] + 0.5,
                bounds=(lo, hi),
                n_iterations=args.bo_iters,
                n_candidates=args.candidates,
                acquisition=acq,
                seed=args.seed,
            )
            results[acq] = bo
            verdict = "beats" if bo.best_value > lml_book else "loses to"
            print(f"BO({acq:3s}): best LML {bo.best_value:10.4f} after "
                  f"{len(bo.values)} evaluations — {verdict} book {lml_book:.4f}")
            log.log("bo_done", acquisition=acq, best_lml=bo.best_value,
                    evaluations=len(bo.values), stopped_early=bo.stopped_early)
            if bo.best_value > best_lml:
                best_lml = bo.best_value
                theta_best = bo.best_params

        if args.compare_acquisitions:
            # the reference's comparison artifact: per-acquisition progress
            # curves against the book-LML line [ref: CO2_example.py:373-379]
            curves = {a: np.maximum.accumulate(r.values) for a, r in results.items()}
            plotting.plot_acquisition_comparison(
                curves, os.path.join(args.out, "acquisition_comparison.png"),
                best_line=lml_book,
                title="CO2 BO: PI vs EI vs UCB vs TS (book LML dashed)",
            )
            print(f"comparison artifact: {args.out}/acquisition_comparison.png")
        else:
            acq = runs[0]
            plotting.plot_bo_progress(
                results[acq].values, os.path.join(args.out, "bo_progress.png"),
                best_line=lml_book,
                title=f"CO2 BO ({acq}) vs book hyperparams",
            )

    # 20-year monthly extrapolation at the winning hyperparams
    # [ref: CO2_example.py:404-423]
    with jax.default_device(_CPU):
        x_test = jnp.asarray(datasets.mauna_loa_test_grid(x_np, years=args.years),
                             jnp.float64)
        params = ops.co2_params_from_vector(jnp.asarray(theta_best, jnp.float64))
        post = gp.posterior(kernel, params, x, y, x_test, noise_variance=5e-4)
    log.log("extrapolation_done", lml=float(post.lml),
            first_mean_ppm=float(post.mean[0] + y_mean),
            last_mean_ppm=float(post.mean[-1] + y_mean))
    log.close()

    plotting.plot_gp_band(
        np.asarray(x_test), np.asarray(post.mean) + y_mean, np.asarray(post.std),
        os.path.join(args.out, "extrapolation.png"),
        x_train=x_np[-120:], y_train=y_np[-120:] + y_mean,
        title=f"Mauna Loa CO2: {args.years}-year extrapolation",
    )
    print(f"extrapolated CO2 at {float(x_test[-1, 0]):.2f}: "
          f"{float(post.mean[-1] + y_mean):.1f} ppm")
    print(f"artifacts in {args.out}/")


if __name__ == "__main__":
    main()
