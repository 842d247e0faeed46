"""A/B: harvest the factorization headroom (VERDICT r3 item 3).

Variants of the left-looking tiled Cholesky at n=8192 (slope-timed, f32,
gram excluded — K prebuilt). Parity at n=4096 vs NumPy f64.
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from gaussian_process_tpu import ops
from gaussian_process_tpu.linalg import blocked
from gaussian_process_tpu.utils import profiling

# let the blocked paths engage at the 4096 parity size too
blocked.MIN_BLOCKED_N = 512

N = int(os.environ.get("AB_N", 8192))
NOISE = 5e-4

rng = np.random.default_rng(0)
x = rng.uniform(-5.0, 5.0, (N, 4))
k = ops.RBF()
P0 = {"sigma": jnp.float32(1.0), "lengthscale": jnp.float32(1.0)}
xd = jnp.asarray(x, jnp.float32)  # small: K is rebuilt in-graph (a closed-over
# 268 MB K bakes into the axon remote-compile payload -> HTTP 413)
# f64 oracle at a subset for parity, built HOST-side (a device_get of the
# full 268 MB K takes minutes through the tunnel)
NP = 4096
xs = x[:NP]
sq = ((xs[:, None, :] - xs[None, :, :]) ** 2).sum(-1)
K4 = np.exp(-0.5 * sq) + NOISE * np.eye(NP)
del sq
L64 = np.linalg.cholesky(K4)
logdet64 = np.sum(np.log(np.diag(L64)))


def leftlook_2level(Km, *, block=2048, inner=512, inv=True):
    """Two-level: outer left-looking; panel chol itself left-looking at
    ``inner`` with GEMM TRSM."""
    n = Km.shape[-1]
    dtype = Km.dtype
    HI = lax.Precision.HIGHEST

    def panel_chol(A):
        b = A.shape[-1]
        L = jnp.zeros_like(A)
        off = 0
        while off < b:
            ib = min(inner, b - off)
            akk = lax.dynamic_slice(A, (off, off), (ib, ib))
            if off > 0:
                lrow = lax.dynamic_slice(L, (off, 0), (ib, off))
                akk = akk - jnp.dot(lrow, lrow.T, preferred_element_type=dtype, precision=HI)
            lkk = lax.linalg.cholesky(akk)
            rem = b - off - ib
            if rem > 0:
                acol = lax.dynamic_slice(A, (off + ib, off), (rem, ib))
                if off > 0:
                    lbot = lax.dynamic_slice(L, (off + ib, 0), (rem, off))
                    acol = acol - jnp.dot(lbot, lrow.T, preferred_element_type=dtype, precision=HI)
                if inv:
                    W = blocked._tri_inv(lkk)
                    lcol = jnp.dot(acol, W.T, preferred_element_type=dtype, precision=HI)
                else:
                    lcol = lax.linalg.triangular_solve(lkk, acol, left_side=False, lower=True, transpose_a=True)
                panel = jnp.concatenate([lkk, lcol], axis=0)
            else:
                panel = lkk
            L = lax.dynamic_update_slice(L, panel, (off, off))
            off += ib
        return L

    L = jnp.zeros_like(Km)
    off = 0
    while off < n:
        b = min(block, n - off)
        A_kk = lax.dynamic_slice(Km, (off, off), (b, b))
        if off > 0:
            Lrow = lax.dynamic_slice(L, (off, 0), (b, off))
            A_kk = A_kk - jnp.dot(Lrow, Lrow.T, preferred_element_type=dtype, precision=HI)
        L_kk = panel_chol(A_kk)
        rem = n - off - b
        if rem > 0:
            A_col = lax.dynamic_slice(Km, (off + b, off), (rem, b))
            if off > 0:
                Lbot = lax.dynamic_slice(L, (off + b, 0), (rem, off))
                A_col = A_col - jnp.dot(Lbot, Lrow.T, preferred_element_type=dtype, precision=HI)
            if inv:
                W = blocked._tri_inv(L_kk)
                L_col = jnp.dot(A_col, W.T, preferred_element_type=dtype, precision=HI)
            else:
                L_col = lax.linalg.triangular_solve(L_kk, A_col, left_side=False, lower=True, transpose_a=True)
            panel = jnp.concatenate([L_kk, L_col], axis=0)
        else:
            panel = L_kk
        L = lax.dynamic_update_slice(L, panel, (off, off))
        off += b
    return L


VARIANTS = {
    "stock": lambda A: lax.linalg.cholesky(A),
    "v0_b1024": lambda A: blocked.blocked_cholesky(A, block=1024),
    "v1_b2048": lambda A: blocked.blocked_cholesky(A, block=2048),
    "v2_b1024_inv": lambda A: blocked.blocked_cholesky(A, block=1024, trsm_via_inverse=True),
    "v4_b1024_pallas": lambda A: blocked.blocked_cholesky(A, block=1024, use_pallas=True),
    "v3_b2048_inv": lambda A: blocked.blocked_cholesky(A, block=2048, trsm_via_inverse=True),
    "v5_b512_inv": lambda A: blocked.blocked_cholesky(A, block=512, trsm_via_inverse=True),
    "v6_2lvl_2048_512": lambda A: leftlook_2level(A, block=2048, inner=512, inv=True),
    "v7_2lvl_2048_1024": lambda A: leftlook_2level(A, block=2048, inner=1024, inv=True),
}

flops = N**3 / 3
for name, fn in VARIANTS.items():
    if os.environ.get("AB_ONLY") and name not in os.environ["AB_ONLY"].split(","):
        continue
    try:
        # parity at 4096
        Lp = np.asarray(jax.jit(fn)(jnp.asarray(K4.astype(np.float32))))
        ld = np.sum(np.log(np.diag(Lp).astype(np.float64)))
        ld_err = abs(ld - logdet64) / abs(logdet64)
        fac_err = np.max(np.abs(Lp - L64)) / np.max(np.abs(L64))

        def step(c, fn=fn):
            params = {"sigma": jnp.float32(1.0) + c * 0.0,
                      "lengthscale": jnp.float32(1.0)}
            Kc = ops.gram(k, params, xd) + NOISE * jnp.eye(N, dtype=jnp.float32)
            return jnp.sum(jnp.log(jnp.diagonal(fn(Kc)))) * 1e-20

        tm = profiling.device_time_chained(step, jnp.float32(0.0), repeats=4,
                                           trials=3, trial_pause_s=1.0)
        ms = tm["device_s"] * 1e3
        tf = flops / tm["device_s"] / 1e12
        print(f"{name:20s} {ms:8.2f} ms  {tf:5.1f} TF/s ({100*tf/32.8:4.1f}% x6)  "
              f"logdet_err {ld_err:.2e}  fac_err {fac_err:.2e}  "
              f"trials {[round(t*1e3,2) for t in tm['trials_s']]}", flush=True)
    except Exception as e:
        print(f"{name:20s} FAILED: {type(e).__name__} {str(e)[:160]}", flush=True)
