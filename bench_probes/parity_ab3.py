"""Manual split-bf16 SYRK variants inside blocked chol: x3/x4 vs HIGHEST.

x4 = hi@hi + hi@lo + lo@hi + lo@lo with manual 2-way f32->bf16 split;
each term is a DEFAULT-precision bf16 GEMM (full 197 TF/s MXU rate).
"""
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

def split2(A):
    hi = A.astype(jnp.bfloat16)
    lo = (A - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo

def bdot(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.float32)

def syrk_x4(A):
    hi, lo = split2(A)
    hiT, loT = hi.T, lo.T
    return bdot(hi, hiT) + (bdot(hi, loT) + bdot(lo, hiT)) + bdot(lo, loT)

def gemm_x4(A, B):
    ah, al = split2(A)
    bh, bl = split2(B)
    return bdot(ah, bh) + (bdot(ah, bl) + bdot(al, bh)) + bdot(al, bl)

def blk_chol(K, block, syrk, panel):
    nn = K.shape[-1]
    out_cols = []
    rest = K
    offset = 0
    while nn - offset > 0:
        b = min(block, nn - offset)
        A_kk = rest[:b, :b]
        A_ik = rest[b:, :b]
        L_kk = lax.linalg.cholesky(A_kk)
        if panel == "trsm":
            L_ik = lax.linalg.triangular_solve(
                L_kk, A_ik, left_side=False, lower=True, transpose_a=True)
        else:  # x4 GEMM vs explicit inverse
            eye = jnp.eye(b, dtype=K.dtype)
            inv_T = lax.linalg.triangular_solve(L_kk, eye, left_side=True,
                                                lower=True).T
            L_ik = gemm_x4(A_ik, inv_T)
        trailing = rest[b:, b:]
        if trailing.shape[0] > 0:
            if syrk == "x4":
                upd = syrk_x4(L_ik)
            else:
                upd = jnp.dot(L_ik, L_ik.T, preferred_element_type=K.dtype,
                              precision=lax.Precision.HIGHEST)
            trailing = trailing - upd
        col = jnp.concatenate([L_kk, L_ik], axis=0) if L_ik.shape[0] else L_kk
        out_cols.append((offset, col))
        rest = trailing
        offset += b
    L = jnp.zeros_like(K)
    for off, col in out_cols:
        L = lax.dynamic_update_slice(L, col, (off, off))
    return L

def report(name, chol_fn, nn=n):
    if nn == n:
        xa_, xt_, y_, mu_o, ld_o, lml_o = x32, xt32, y32, mu64, logdiag64, lml64
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
        lml = -0.5 * yv @ al - ld - 0.5 * nn * np.log(2 * np.pi)
        return mu, ld, lml

    mu, ld, lml = jax.device_get(run(xa_, xt_, y_))
    def step(c):
        K = gram32(xa_ + c * 0.0, xa_, NOISE)
        return jnp.sum(jnp.log(jnp.diagonal(chol_fn(K)))) * 1e-30
    tm = profiling.device_time_chained(step, jnp.float32(0.0), repeats=6)
    mean_err = np.max(np.abs(mu - mu_o)) / np.max(np.abs(mu_o))
    lml_err = abs(lml - lml_o) / abs(lml_o)
    print(f"{name:30s} ms={tm['device_s']*1e3:7.2f}  "
          f"mean_err={mean_err:.2e}  lml_err={lml_err:.2e}", flush=True)

report("b512  syrk=x4 panel=trsm", lambda K: blk_chol(K, 512, "x4", "trsm"))
report("b512  syrk=x4 panel=x4inv", lambda K: blk_chol(K, 512, "x4", "x4"))
report("b1024 syrk=x4 panel=trsm", lambda K: blk_chol(K, 1024, "x4", "trsm"))
report("b1024 syrk=x4 panel=x4inv", lambda K: blk_chol(K, 1024, "x4", "x4"))
