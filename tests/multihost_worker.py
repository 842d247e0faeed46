"""Worker process for the multi-host loopback test (launched by
test_multihost.py; not collected by pytest).

Simulates one host of a pod: 4 emulated local CPU devices, DCN over
localhost via jax.distributed (SURVEY.md §4, strategy item 4). Exercises:
bring-up, global mesh spanning processes, cross-host restart-sharded LML
vs a float64 local oracle, host barrier, and per-rank checkpointing.
"""

import os
import sys

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=4"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.sharding import PartitionSpec as P  # noqa: E402


def main() -> None:
    coordinator, nproc, pid, workdir = (
        sys.argv[1],
        int(sys.argv[2]),
        int(sys.argv[3]),
        sys.argv[4],
    )

    from gaussian_process_tpu import gp, ops, parallel
    from gaussian_process_tpu.parallel import multihost
    from gaussian_process_tpu.utils import checkpoint

    multihost.initialize(coordinator, nproc, pid)
    assert jax.process_count() == nproc, jax.process_count()
    assert len(jax.devices()) == 4 * nproc, jax.devices()
    assert multihost.is_coordinator() == (pid == 0)

    # global (restart=2, data=2*nproc) mesh spanning both processes
    mesh = multihost.global_mesh(restart=2)
    assert mesh.shape == {"restart": 2, "data": 2 * nproc}, mesh.shape

    # shared dataset (same seed everywhere — replicated inputs)
    rng = np.random.default_rng(7)
    x = rng.uniform(-5, 5, (24, 2))
    y = np.sin(0.9 * x.sum(axis=1))
    kernel = ops.RBF()

    # two hyperparameter candidates, one per restart-mesh-row; each process
    # holds the full candidate list (replicated batch assembled globally)
    cand = {
        "sigma": np.asarray([1.0, 2.0]),
        "lengthscale": np.asarray([1.0, 0.5]),
    }
    batch = jax.tree_util.tree_map(
        lambda leaf: multihost.host_local_to_global(mesh, P("restart"), leaf),
        cand,
    )
    xg = multihost.replicate_to_global(mesh, x)
    yg = multihost.replicate_to_global(mesh, y)

    lml_fn = parallel.make_sharded_lml(kernel, mesh=mesh)
    got = multihost.global_to_host_local(lml_fn(batch, xg, yg))

    # float64 local oracle: each process recomputes both candidates alone
    for i in range(2):
        p = {k: jnp.asarray(v[i]) for k, v in cand.items()}
        want = float(gp.log_marginal_likelihood(kernel, p, x, y))
        err = abs(float(got[i]) - want) / (abs(want) + 1e-12)
        assert err < 1e-8, (pid, i, float(got[i]), want)

    # barrier: a dead host would raise here on the survivor
    multihost.sync_hosts("after-lml")

    # per-rank checkpoint + restore roundtrip
    ck = os.path.join(workdir, "ckpt")
    state = {"pid": np.asarray(pid), "lml": got}
    checkpoint.save(ck, state, step=1)
    back = checkpoint.restore(ck, state, step=1)
    assert int(back["pid"]) == pid
    np.testing.assert_allclose(back["lml"], got)

    multihost.sync_hosts("done")
    print(f"WORKER_OK {pid}", flush=True)


if __name__ == "__main__":
    main()
