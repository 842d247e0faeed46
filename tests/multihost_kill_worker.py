"""Worker for the kill-one-host fault-injection test (launched by
test_multihost.py; not collected by pytest).

3 processes bring up jax.distributed over localhost. Rank 2 dies abruptly
(os._exit — no shutdown handshake, simulating a crashed/preempted host)
after the first barrier. Survivors must (SURVEY.md §5, failure-detection
row):

1. DETECT: ``multihost.sync_hosts(timeout_s=...)`` raises on every survivor
   (coordination-service barrier deadline) instead of hanging;
2. RECOVER: re-dispatch the dead host's candidates over the surviving
   devices via ``recovery.run_with_redispatch`` on a locally rebuilt mesh
   (candidates are stateless — at-least-once redispatch, parallel/recovery.py).
"""

import os
import sys

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=2"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def main() -> None:
    coordinator, nproc, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    assert nproc == 3

    from gaussian_process_tpu import gp, ops, parallel
    from gaussian_process_tpu.parallel import multihost

    multihost.initialize(coordinator, nproc, pid)
    assert jax.process_count() == nproc

    # every host knows the full candidate list and the static assignment
    cand = {
        "sigma": np.asarray([1.0, 1.5, 2.0]),
        "lengthscale": np.asarray([1.0, 0.7, 0.5]),
    }
    owner = np.asarray([0, 1, 2])  # candidate i owned by host i
    rng = np.random.default_rng(5)
    x = rng.uniform(-5, 5, (16, 2))
    y = np.sin(0.9 * x.sum(axis=1))
    kernel = ops.RBF()

    multihost.sync_hosts("all-up", timeout_s=60)

    if pid == 2:
        # crashed host: no shutdown handshake, no atexit
        os._exit(17)

    # ---- 1. DETECT: the barrier must RAISE on the survivors, not hang
    detected = False
    try:
        multihost.sync_hosts("after-work", timeout_s=8)
    except Exception as exc:
        detected = True
        print(f"DETECTED {pid}: {type(exc).__name__}", flush=True)
    assert detected, "barrier with a dead host did not raise on the survivor"

    # ---- 2. RECOVER: rebuild a mesh over THIS host's own devices and
    # re-dispatch every candidate whose owner is not known-alive. The dead
    # coordination state can no longer be trusted for collectives, so
    # recovery work is host-local (restart candidates are stateless).
    local_mesh = parallel.make_mesh(
        restart=2, data=1, devices=jax.local_devices()
    )
    lml_fn = parallel.make_sharded_lml(kernel, mesh=local_mesh)

    lost = [i for i in range(len(owner)) if owner[i] == 2]
    mine = [i for i in range(len(owner)) if owner[i] == pid]
    todo = sorted(mine + (lost if pid == 0 else []))  # survivor 0 adopts
    batch = {k: v[todo] for k, v in cand.items()}

    def eval_batch(b):
        return lml_fn(
            jax.tree_util.tree_map(jnp.asarray, b), jnp.asarray(x), jnp.asarray(y)
        )

    res = parallel.run_with_redispatch(eval_batch, batch, batch_granularity=2)
    assert res.ok.all(), res

    # parity: re-dispatched values equal a fresh local oracle
    for j, i in enumerate(todo):
        p = {k: jnp.asarray(v[i]) for k, v in cand.items()}
        want = float(gp.log_marginal_likelihood(kernel, p, x, y))
        err = abs(res.values[j] - want) / (abs(want) + 1e-12)
        assert err < 1e-8, (pid, i, res.values[j], want)

    print(f"SURVIVOR_OK {pid} recovered={len(lost) if pid == 0 else 0}", flush=True)
    os._exit(0)  # skip distributed shutdown: the coordinator half is gone


if __name__ == "__main__":
    main()
