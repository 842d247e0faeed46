"""A/B (r5): large-m variance chunking for the matrix-free posterior.

gp.posterior_cg computes the m-point predictive variance by block-CG over
``test_chunk``-column chunks; every column in a chunk rides the SAME
kernel tiles per iteration, so wider chunks amortise the (transcendental-
bound) tile evaluations while the per-column dot work stays fixed.

Measured 2026-08-21 on the tunnelled v5e (n=102400, m=2048, d=4, RBF
sigma=1 l=2, noise=1e-2, Nystrom rank 2048, tol=1e-3, warm):

  test_chunk=512  (5 solves):  45.6 s, 155 total iters   (r5's first row)
  test_chunk=1024 (2 solves):  41.4 s,  80 total iters
  test_chunk=2048 (1 solve):   35.1 s,  38 iters          <- 1.30x, ships

The monolithic solve's ~35 s single execution stays under the axon
worker's ~60 s watchdog; the committed bench row (cg_posterior_n102400_
m2048) uses full width via GP_BENCH_CG_CHUNK's default. Prereq for the
wide RHS: _matvec_fwd_impl's explicit scoped-vmem budget (r_pad ~ 2056
blew the 16 MB in-loop default) and the symmetric-sweep gate requiring
r_pad <= 64. Run: python bench_probes/variance_chunk_ab_r5.py (TPU).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from gaussian_process_tpu import gp, ops

n = int(os.environ.get("AB_N", 102400))
m = int(os.environ.get("AB_M", 2048))
rank = 2048
rng = np.random.default_rng(0)
x = jnp.asarray(rng.uniform(-5.0, 5.0, (n, 4)), jnp.float32)
y = jnp.asarray(np.sin(0.9 * np.asarray(x).sum(1))
                + 0.02 * rng.standard_normal(n), jnp.float32)
xt = x[:m] + 0.1
k = ops.RBF()
p = {"sigma": jnp.float32(1.0), "lengthscale": jnp.float32(2.0)}

for chunk in (2048, 1024, 512):
    def run():
        post = gp.posterior_cg(
            k, p, x, y, xt, noise_variance=1e-2, tol=1e-3, max_iters=120,
            test_chunk=chunk, use_pallas=True,
            preconditioner="nystrom", precond_rank=rank,
        )
        return jax.device_get((post.mean, post.var, post.iters, post.resnorm))
    run()  # compile + warm
    t0 = time.time()
    _mean, _var, iters, resnorm = run()
    print(f"chunk={chunk}: warm {time.time()-t0:.1f}s "
          f"iters={int(iters)} resnorm={float(resnorm):.3f}", flush=True)
