"""A/B experiment: where does the solve parity error enter on TPU?

Variants at n=8192, d=4 RBF + 5e-4 noise, vs f64 NumPy oracle:
  stock      — lax.linalg.cholesky
  blk-HIGH   — blocked_cholesky precision=HIGH   (current production)
  blk-HIGHEST— blocked_cholesky precision=HIGHEST
For each: rel err of sum(log diag L), rel LML err, rel mean err, device ms.
"""
import os, sys, time
import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from gaussian_process_tpu.linalg import blocked
from gaussian_process_tpu.utils import profiling

n, m, d = 8192, 2048, 4
SIGMA, L_SCALE, NOISE = 1.0, 1.0, 5e-4

rng = np.random.default_rng(0)
x = rng.uniform(-5.0, 5.0, (n, d))
y = np.sin(0.9 * x.sum(axis=1)) + 0.02 * rng.standard_normal(n)
xt = rng.uniform(-5.0, 5.0, (m, d))

# f64 oracle on host
def rbf64(a, b):
    sq = (a * a).sum(1)[:, None] + (b * b).sum(1)[None, :] - 2 * a @ b.T
    return SIGMA**2 * np.exp(-0.5 * np.maximum(sq, 0) / L_SCALE**2)

K64 = rbf64(x, x) + NOISE * np.eye(n)
Ks64 = rbf64(x, xt)
L64 = np.linalg.cholesky(K64)
from scipy.linalg import solve_triangular
al64 = solve_triangular(L64.T, solve_triangular(L64, y, lower=True), lower=False)
mu64 = Ks64.T @ al64
logdiag64 = np.sum(np.log(np.diag(L64)))
lml64 = -0.5 * y @ al64 - logdiag64 - 0.5 * n * np.log(2 * np.pi)

x32 = jnp.asarray(x, jnp.float32)
xt32 = jnp.asarray(xt, jnp.float32)
y32 = jnp.asarray(y, jnp.float32)

def gram32(a, b, noise=0.0):
    sq = ((a * a).sum(1)[:, None] + (b * b).sum(1)[None, :]
          - 2 * jnp.dot(a, b.T, precision=lax.Precision.HIGHEST))
    K = SIGMA**2 * jnp.exp(-0.5 * jnp.maximum(sq, 0) / L_SCALE**2)
    if noise:
        K = K + noise * jnp.eye(a.shape[0], dtype=K.dtype)
    return K

def report(name, chol_fn):
    @jax.jit
    def run(xa, xb, yv):
        K = gram32(xa, xa, NOISE)
        Ks = gram32(xa, xb)
        L = chol_fn(K)
        tmp = lax.linalg.triangular_solve(L, yv[:, None], left_side=True, lower=True)
        al = lax.linalg.triangular_solve(L, tmp, left_side=True, lower=True,
                                         transpose_a=True)[:, 0]
        mu = Ks.T @ al
        ld = jnp.sum(jnp.log(jnp.diagonal(L)))
        lml = -0.5 * yv @ al - ld - 0.5 * n * np.log(2 * np.pi)
        return mu, ld, lml

    mu, ld, lml = jax.device_get(run(x32, xt32, y32))
    # timing of gram+chol (slope method; gram ~0.6 ms, same for every variant)
    def step(c):
        K = gram32(x32 + c * 0.0, x32, NOISE)
        return jnp.sum(jnp.log(jnp.diagonal(chol_fn(K)))) * 1e-30
    tm = profiling.device_time_chained(step, jnp.float32(0.0), repeats=6)
    mean_err = np.max(np.abs(mu - mu64)) / np.max(np.abs(mu64))
    ld_err = abs(ld - logdiag64) / abs(logdiag64)
    lml_err = abs(lml - lml64) / abs(lml64)
    print(f"{name:14s} chol_ms={tm['device_s']*1e3:7.2f}  "
          f"mean_err={mean_err:.2e}  logdiag_err={ld_err:.2e}  lml_err={lml_err:.2e}",
          flush=True)

report("stock", lax.linalg.cholesky)
report("blk-HIGH", lambda K: blocked.blocked_cholesky(K, precision=lax.Precision.HIGH))
report("blk-HIGHEST", lambda K: blocked.blocked_cholesky(K, precision=lax.Precision.HIGHEST))
report("blk-HI-1024", lambda K: blocked.blocked_cholesky(K, block=1024, precision=lax.Precision.HIGHEST))
