"""A/B (r5): multiclass stacked-system CG preconditioners.

Measures total inner CG iterations for the matrix-free softmax-Laplace
fit (gp.laplace_fit_multiclass_cg's inner system B = I + W^1/2 K W^1/2)
under three preconditioners:

  none      — plain CG;
  diag-D    — per-class Woodbury over the shared Nyström factor with only
              W's diagonal D (what r5 first shipped: drops the -pi pi^T
              class coupling);
  coupled   — the full (Cr, Cr) Gram (V^T V)[(c,j),(d,k)] =
              sum_i W_i[c,d] U_ij U_ik (what ships now).

Measured 2026-08-21 (CPU f64, n=4096, C=3, rank=128, cg_tol=1e-4):

  none     : newton=8   inner=123
  diag-D   : newton=9   inner=693   <- WORSE than no preconditioner: the
             D >= W Woodbury over-corrects the identity-dominated
             directions the coupling -pi pi^T would have cancelled
  coupled  : newton=8   inner=16    <- 8x fewer than plain, 43x diag-D

The coupled build costs one W-weighted einsum (n C^2 r^2 flops at HIGH
precision) per Newton step — repaid many times over in avoided
kernel-matvec sweeps. Run: python bench_probes/multiclass_precond_ab_r5.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax import lax  # noqa: E402

from gaussian_process_tpu import gp, ops  # noqa: E402
from gaussian_process_tpu.gp import multiclass as mc  # noqa: E402
from gaussian_process_tpu.linalg import cg as _cg  # noqa: E402
from gaussian_process_tpu.linalg import cholesky as _chol  # noqa: E402
from gaussian_process_tpu.linalg import nystrom as _nys  # noqa: E402

N = int(os.environ.get("AB_N", 4096))
C, RANK, CG_TOL = 3, 128, 1e-4

rng = np.random.default_rng(0)
x = jnp.asarray(rng.uniform(-3, 3, (N, 2)))
ang = np.arctan2(np.asarray(x)[:, 1], np.asarray(x)[:, 0])
yl = jnp.asarray(((ang + np.pi) / (2 * np.pi) * C).astype(int) % C)
k = ops.RBF()
p = k.init_params()

# ---- the shipped (coupled) path, straight from the library
st = gp.laplace_fit_multiclass_cg(
    k, p, x, yl, C, precond_rank=RANK, use_pallas=False, cg_tol=CG_TOL
)
print(f"coupled : newton={int(st.iters)} inner={int(st.inner_iters)}")

# ---- ablations: re-run the same Newton iteration with weaker
# preconditioners (host loop; same math as laplace_fit_multiclass_cg)
K = ops.gram(k, p, x)
U, _G, _i = _nys.make_nystrom_factor(k, p, x, rank=RANK)
r = U.shape[1]
dt = U.dtype
y1 = gp.one_hot_targets(yl, C).astype(dt)
tol = max(10.0 * float(np.sqrt(np.finfo(np.float64).eps)), CG_TOL)


def w_sqrt(pi):
    return mc._w_sqrt_blocks(pi)


def run(precond):
    f = jnp.zeros((C, N), dt)
    inner = 0
    for it in range(100):
        pi = mc._softmax_over_classes(f)
        S = w_sqrt(pi)

        def Bmv(u_flat):
            u = u_flat.reshape(C, N)
            out = u + mc._w_half_apply(S, (K @ mc._w_half_apply(S, u).T).T)
            return out.reshape(C * N)

        kwargs = {}
        if precond == "diagD":
            sw_d = jnp.sqrt(pi)
            V = sw_d[:, :, None] * U[None]
            G = jnp.eye(r, dtype=dt)[None] + jnp.einsum("cnj,cnk->cjk", V, V)
            cholG = jax.vmap(lambda g: _chol.safe_cholesky(g).factor)(G)

            def apply(u_flat):
                u = u_flat.reshape(C, N)
                w = jnp.einsum("cnj,cn->cj", V, u)
                z = jax.vmap(_chol.cholesky_solve)(cholG, w)
                return (u - jnp.einsum("cnj,cj->cn", V, z)).reshape(C * N)

            kwargs["precond_apply"] = apply

        b = mc._w_apply(pi, f) + y1 - pi
        Kb = (K @ b.T).T
        rhs = mc._w_half_apply(S, Kb).reshape(C * N)
        cg = _cg.cg_solve(Bmv, rhs, tol=CG_TOL, max_iters=500, **kwargs)
        inner += int(cg.iters)
        a = b - mc._w_half_apply(S, cg.x.reshape(C, N))
        f_new = (K @ a.T).T
        err = float(jnp.linalg.norm(f_new - f) / (1 + jnp.linalg.norm(f_new)))
        f = f_new
        if err <= tol:
            return it + 1, inner
    return 100, inner


for name in ("none", "diagD"):
    nt, inner = run(name)
    print(f"{name:8s}: newton={nt} inner={inner}")
