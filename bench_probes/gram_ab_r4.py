"""A/B: XLA ops.gram vs Pallas tiled gram at n=8192, d=4 (VERDICT r3 item 4).

Slope-timed (device_time_chained). Floor: n^2 * 4 B / 819 GB/s = 0.33 ms.
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from gaussian_process_tpu import ops
from gaussian_process_tpu.ops import pallas as pops
from gaussian_process_tpu.utils import profiling

n, d = 8192, 4
rng = np.random.default_rng(0)
x = jnp.asarray(rng.uniform(-5, 5, (n, d)), jnp.float32)
k = ops.RBF()
P0 = {"sigma": jnp.float32(1.0), "lengthscale": jnp.float32(1.0)}

def bench(name, fn):
    def step(A):
        params = {"sigma": jnp.float32(1.0) + A[0, 0] * 0.0,
                  "lengthscale": jnp.float32(1.0)}
        return fn(params)
    init = fn(P0)
    tm = profiling.device_time_chained(step, init, repeats=12,
                                       readout=lambda A: A[0, 0],
                                       trials=3, trial_pause_s=1.0)
    ms = tm["device_s"] * 1e3
    gbps = n * n * 4 / tm["device_s"] / 1e9
    print(f"{name:28s} {ms:7.3f} ms  {gbps:6.0f} GB/s  trials={[round(t*1e3,3) for t in tm['trials_s']]}", flush=True)
    return init

ref = bench("xla ops.gram", lambda p: ops.gram(k, p, x))
for tm_, tn_ in [(256, 256), (256, 512), (512, 512), (512, 1024), (1024, 512), (1024, 1024), (2048, 512)]:
    try:
        out = bench(f"pallas gram {tm_}x{tn_}",
                    lambda p, a=tm_, b=tn_: pops.gram(k, p, x, tile_m=a, tile_n=b))
        err = float(jnp.max(jnp.abs(out - ref)))
        print(f"    max abs err vs xla: {err:.2e}", flush=True)
    except Exception as e:
        print(f"    {tm_}x{tn_} FAILED: {type(e).__name__} {str(e)[:200]}", flush=True)
