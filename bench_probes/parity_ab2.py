"""Which GEMM loses the accuracy: panel-solve (A_ik L_kk^{-T}) or SYRK?
Also: substitution TRSM vs explicit-inverse GEMM for the panel."""
import sys
import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from gaussian_process_tpu.utils import profiling

n, m, d = 8192, 2048, 4
SIGMA, L_SCALE, NOISE = 1.0, 1.0, 5e-4

rng = np.random.default_rng(0)
x = rng.uniform(-5.0, 5.0, (n, d))
y = np.sin(0.9 * x.sum(axis=1)) + 0.02 * rng.standard_normal(n)
xt = rng.uniform(-5.0, 5.0, (m, d))

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

def _tri_inv(L):
    eye = jnp.eye(L.shape[-1], dtype=L.dtype)
    return lax.linalg.triangular_solve(L, eye, left_side=True, lower=True)

def blk_chol(K, block, panel_prec, syrk_prec, panel_mode="inv"):
    nn = K.shape[-1]
    out_cols = []
    rest = K
    offset = 0
    while nn - offset > 0:
        b = min(block, nn - offset)
        A_kk = rest[:b, :b]
        A_ik = rest[b:, :b]
        L_kk = lax.linalg.cholesky(A_kk)
        if panel_mode == "inv":
            inv_T = _tri_inv(L_kk).T
            L_ik = jnp.dot(A_ik, inv_T, preferred_element_type=K.dtype,
                           precision=panel_prec)
        else:  # substitution TRSM (stock op)
            L_ik = lax.linalg.triangular_solve(
                L_kk, A_ik, left_side=False, lower=True, transpose_a=True)
        trailing = rest[b:, b:]
        if trailing.shape[0] > 0:
            trailing = trailing - jnp.dot(
                L_ik, L_ik.T, preferred_element_type=K.dtype, precision=syrk_prec)
        col = jnp.concatenate([L_kk, L_ik], axis=0) if L_ik.shape[0] else L_kk
        out_cols.append((offset, col))
        rest = trailing
        offset += b
    L = jnp.zeros_like(K)
    for off, col in out_cols:
        L = lax.dynamic_update_slice(L, col, (off, off))
    return L

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
    def step(c):
        K = gram32(x32 + c * 0.0, x32, NOISE)
        return jnp.sum(jnp.log(jnp.diagonal(chol_fn(K)))) * 1e-30
    tm = profiling.device_time_chained(step, jnp.float32(0.0), repeats=6)
    mean_err = np.max(np.abs(mu - mu64)) / np.max(np.abs(mu64))
    lml_err = abs(lml - lml64) / abs(lml64)
    print(f"{name:26s} ms={tm['device_s']*1e3:7.2f}  "
          f"mean_err={mean_err:.2e}  lml_err={lml_err:.2e}", flush=True)

H, HH = lax.Precision.HIGH, lax.Precision.HIGHEST
report("panel=HH syrk=H", lambda K: blk_chol(K, 512, HH, H))
report("panel=H  syrk=HH", lambda K: blk_chol(K, 512, H, HH))
report("panel=TRSM syrk=H", lambda K: blk_chol(K, 512, None, H, "trsm"))
report("panel=TRSM syrk=HH", lambda K: blk_chol(K, 512, None, HH, "trsm"))
report("b=2048 panel=HH syrk=HH", lambda K: blk_chol(K, 2048, HH, HH))
