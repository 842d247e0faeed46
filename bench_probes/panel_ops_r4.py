"""Per-op microbench: building blocks of the left-looking panel chol at
n=8192, b=1024. Robust slope estimator; repeats sized so the chained work
(>= ~40 ms) dwarfs RTT jitter.
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from gaussian_process_tpu.utils import profiling

HI = lax.Precision.HIGHEST
rng = np.random.default_rng(0)

def spd(b):
    a = rng.standard_normal((b, b)).astype(np.float32)
    return jnp.asarray(a @ a.T / b + np.eye(b, dtype=np.float32))

def run(name, op, init, repeats, flops=None):
    """op: array -> array (same shape). Chained with true data dependence:
    X_{k+1} = X_k + 1e-32 * op(X_k)."""
    def step(X):
        return X + jnp.float32(1e-32) * op(X)
    tm = profiling.device_time_chained(step, init, repeats=repeats,
                                       readout=lambda X: X.ravel()[0],
                                       trials=3, trial_pause_s=1.0)
    ms = tm["device_s"] * 1e3
    extra = f"  {flops / tm['device_s'] / 1e12:6.1f} TF/s" if flops else ""
    print(f"{name:34s} {ms:8.3f} ms{extra}  trials {[round(t*1e3,3) for t in tm['trials_s']]}", flush=True)

for b in (512, 1024, 2048):
    A = spd(b)
    reps = max(32, int(40e6 / (b ** 3 / 3 / 15)))  # target >= ~40ms chain at ~15TF/s... cap
    reps = min(reps, 512)
    run(f"stock chol({b})", lambda X: lax.linalg.cholesky(X), A,
        repeats=reps, flops=b ** 3 / 3)

b = 1024
L1 = lax.linalg.cholesky(spd(b))
eye = jnp.eye(b, dtype=jnp.float32)
run("tri_inv(1024) [TRSM vs eye]",
    lambda X: lax.linalg.triangular_solve(L1, X, left_side=True, lower=True),
    eye, repeats=128, flops=b ** 3 / 2)

rem = 7168
B = jnp.asarray(rng.standard_normal((rem, b)).astype(np.float32))
run(f"TRSM right ({rem}x{b})",
    lambda X: lax.linalg.triangular_solve(L1, X, left_side=False, lower=True, transpose_a=True),
    B, repeats=32, flops=rem * b * b)
W1 = lax.linalg.triangular_solve(L1, eye, left_side=True, lower=True)
run(f"GEMM ({rem}x{b})@({b}x{b}) HIGHEST",
    lambda X: jnp.dot(X, W1.T, preferred_element_type=jnp.float32, precision=HI),
    B, repeats=32, flops=rem * b * b)
run(f"GEMM ({rem}x{b})@({b}x{b}) HIGH",
    lambda X: jnp.dot(X, W1.T, preferred_element_type=jnp.float32, precision=lax.Precision.HIGH),
    B, repeats=32, flops=rem * b * b)
# update GEMM shape: (1024 x 7168) @ (7168 x 1024) -> 1024x1024, HIGHEST
C = jnp.asarray(rng.standard_normal((b, rem)).astype(np.float32))
run(f"GEMM ({b}x{rem})@({rem}x{b}) HIGHEST",
    lambda X: (X @ jnp.full((rem, b), 1e-3, jnp.float32))
              @ jnp.full((b, rem), 1e-3, jnp.float32),
    C, repeats=32, flops=2 * b * rem * b)
