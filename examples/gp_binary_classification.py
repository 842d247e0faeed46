"""Binary Laplace GP classification on two-moons.

[ref: GP_binary_classification.py:157-250 (__main__): moons noise=0.3,
60/40 split, RBF sigma=l=1, Newton to the Laplace mode, accuracy print at
:241]. Unlike the reference (quirk Q2: W and grad frozen at a prior sample),
this runs true Newton and converges in a handful of iterations.

Run: python examples/gp_binary_classification.py [--out /tmp/gpc_out]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse

import jax.numpy as jnp
import numpy as np

from gaussian_process_tpu import gp, ops
from gaussian_process_tpu.utils import datasets, plotting
from gaussian_process_tpu.utils.logging import JsonlLogger


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", choices=["moons", "circles", "linsep"], default="moons")
    ap.add_argument("--noise", type=float, default=0.3)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="artifacts/gp_binary")
    args = ap.parse_args()

    X_train, X_test, y_train, y_test = datasets.moons_binary(
        noise=args.noise, seed=args.seed
    ) if args.dataset == "moons" else datasets.binary_dataset(args.dataset, seed=args.seed)

    kernel = ops.RBF()  # sigma=1, l=1 [ref: GP_binary_classification.py:179]
    params = kernel.init_params()
    Xtr = jnp.asarray(X_train, jnp.float32)
    ytr = jnp.asarray(y_train, jnp.float32)
    Xte = jnp.asarray(X_test, jnp.float32)

    state = gp.fit_binary(kernel, params, Xtr, ytr)
    pred = gp.predict_binary(kernel, params, state, Xtr, Xte)
    acc = float((np.asarray(pred.label) == y_test).mean())

    os.makedirs(args.out, exist_ok=True)
    with JsonlLogger(os.path.join(args.out, "run.jsonl")) as log:
        errors = np.asarray(state.error_trace)
        for i, e in enumerate(errors[np.isfinite(errors)]):
            log.newton_step(i + 1, float(e))
        log.log(
            "classification_done",
            dataset=args.dataset,
            accuracy=acc,
            newton_iters=int(state.iters),
            converged=bool(state.converged),
            laplace_lml=float(state.lml),
        )

    plotting.plot_convergence(
        np.asarray(state.error_trace), os.path.join(args.out, "newton.png"),
        title="Newton convergence (binary Laplace)",
    )
    plotting.plot_classification_2d(
        X_train, y_train, X_test, np.asarray(pred.label),
        os.path.join(args.out, "classification.png"),
        title=f"{args.dataset}: accuracy {acc:.2%}",
    )

    # the reference's print [ref: GP_binary_classification.py:241]
    print(f"classification right rate: {acc:.4f}")
    print(f"Newton converged in {int(state.iters)} iterations (laplace LML {float(state.lml):.3f})")
    print(f"artifacts in {args.out}/")


if __name__ == "__main__":
    main()
