"""Mauna Loa CO2: composite kernel, BO over the 11-D hyperparameter space,
20-year extrapolation.

[ref: CO2_example.py:404-423 (__main__): load Mauna Loa, mean-center,
tune_hyperparameters_BO (:330-379 — 10 iters x 500 candidates per
acquisition, compared against the book hyperparams theta_book at :324),
make_prediction 20-year monthly grid (:182-214,408) and plot (:382-401)].

Differences: the vendored CSV replaces the dead fetch_mldata (quirk Q7), all
four acquisitions genuinely dispatch (quirk Q5 fixed), and the LML uses the
corrected formula (quirk Q1).

Run: python examples/co2.py [--bo-iters 10 --candidates 500]
(defaults are scaled down so the demo finishes in minutes; pass the reference
values above to reproduce the full search)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse

import jax.numpy as jnp
import numpy as np

from gaussian_process_tpu import gp, ops
from gaussian_process_tpu.opt import tune_bayesian_opt
from gaussian_process_tpu.utils import datasets, plotting
from gaussian_process_tpu.utils.logging import JsonlLogger

# GPML sec. 5.4.3 book hyperparameters [ref: CO2_example.py:324]
THETA_BOOK = np.array([66.0, 67.0, 2.4, 90.0, 1.3, 0.66, 1.2, 0.78, 0.18, 1.6, 0.19])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--bo-iters", type=int, default=5)
    ap.add_argument("--candidates", type=int, default=100)
    ap.add_argument("--acquisition", choices=["PI", "EI", "UCB", "TS"], default="PI")
    ap.add_argument("--years", type=int, default=20)
    ap.add_argument("--skip-bo", action="store_true", help="just fit at the book values")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="artifacts/co2")
    args = ap.parse_args()

    x_np, y_np, y_mean = datasets.mauna_loa()
    x = jnp.asarray(x_np, jnp.float32)
    y = jnp.asarray(y_np, jnp.float32)
    kernel = ops.co2_kernel()

    def lml_at(theta: np.ndarray) -> float:
        params = ops.co2_params_from_vector(jnp.asarray(theta, jnp.float32))
        return float(
            gp.log_marginal_likelihood(kernel, params, x, y, noise_variance=5e-4)
        )

    lml_book = lml_at(THETA_BOOK)
    os.makedirs(args.out, exist_ok=True)
    log = JsonlLogger(os.path.join(args.out, "run.jsonl"))
    log.log("book_lml", theta=THETA_BOOK, lml=lml_book)
    print(f"LML at book hyperparams: {lml_book:.4f}")

    theta_best = THETA_BOOK
    if not args.skip_bo:
        # book-anchored candidate box [ref: CO2_example.py:109-128
        # (random_sample_test_parms draws around the book values)]
        lo = np.maximum(THETA_BOOK * 0.5, 1e-3)
        hi = THETA_BOOK * 1.5
        bo = tune_bayesian_opt(
            lml_at,
            initial_points=THETA_BOOK[None, :] + 0.5,
            bounds=(lo, hi),
            n_iterations=args.bo_iters,
            n_candidates=args.candidates,
            acquisition=args.acquisition,
            seed=args.seed,
        )
        log.log("bo_done", best_lml=bo.best_value, evaluations=len(bo.values),
                acquisition=args.acquisition)
        print(f"BO ({args.acquisition}) best LML: {bo.best_value:.4f} "
              f"({len(bo.values)} evaluations) — book: {lml_book:.4f}")
        plotting.plot_bo_progress(
            bo.values, os.path.join(args.out, "bo_progress.png"), best_line=lml_book,
            title=f"CO2 BO ({args.acquisition}) vs book hyperparams",
        )
        if bo.best_value > lml_book:
            theta_best = bo.best_params

    # 20-year monthly extrapolation at the winning hyperparams
    # [ref: CO2_example.py:404-423]
    x_test = jnp.asarray(datasets.mauna_loa_test_grid(x_np, years=args.years), jnp.float32)
    params = ops.co2_params_from_vector(jnp.asarray(theta_best, jnp.float32))
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
