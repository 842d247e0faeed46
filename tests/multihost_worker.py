"""Worker process for the multi-host loopback test (launched by
test_multihost.py; not collected by pytest).

Simulates one host of a pod: 4 emulated local CPU devices, DCN over
localhost via jax.distributed (SURVEY.md §4, strategy item 4). Exercises:
bring-up, global mesh spanning processes, cross-host restart-sharded LML
vs a float64 local oracle, the distributed panel-Cholesky posterior and
block-CG posterior with the DATA axis spanning the process (DCN) boundary
at an uneven n (masked padding), host barrier, per-rank checkpointing, and
a sharded-array checkpoint round-trip (per-shard save + global restore).
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
    assert multihost.live_hosts() == list(range(nproc))

    # ---- distributed solves with the data axis SPANNING the DCN boundary
    # (mesh rows above kept the data axis within a host; this mesh makes
    # every panel-Cholesky all_gather and CG ring ppermute cross processes)
    mesh_flat = multihost.global_mesh(restart=1)
    ndev = 4 * nproc
    assert mesh_flat.shape == {"restart": 1, "data": ndev}
    n_uneven = 51  # does not divide the 8-device data axis: masked padding
    xu = rng.uniform(-5, 5, (n_uneven, 2))
    yu = np.sin(0.9 * xu.sum(axis=1))
    x_test = xu[:6] + 0.05

    n_pad = -(-n_uneven // ndev) * ndev
    xu_p = np.zeros((n_pad, 2))
    xu_p[:n_uneven] = xu
    yu_p = np.zeros(n_pad)
    yu_p[:n_uneven] = yu
    rows = slice(pid * (n_pad // nproc), (pid + 1) * (n_pad // nproc))
    xg_u = multihost.host_local_to_global(mesh_flat, P("data"), xu_p[rows])
    yg_u = multihost.host_local_to_global(mesh_flat, P("data"), yu_p[rows])
    xt_g = multihost.replicate_to_global(mesh_flat, x_test)

    oracle = gp.posterior(kernel, kernel.init_params(), xu, yu, x_test,
                          noise_variance=1e-4)

    chol_solver = parallel.make_distributed_posterior(
        kernel, mesh=mesh_flat, noise_variance=1e-4, n_true=n_uneven
    )
    mean_c, var_c, lml_c, _ = chol_solver(kernel.init_params(), xg_u, yg_u, xt_g)
    np.testing.assert_allclose(
        multihost.fetch_replicated(mean_c), np.asarray(oracle.mean), atol=1e-8
    )
    np.testing.assert_allclose(
        multihost.fetch_replicated(var_c), np.asarray(oracle.var), atol=1e-8
    )
    assert abs(float(multihost.fetch_replicated(lml_c)) - float(oracle.lml)) < 1e-8

    cg_solver = parallel.make_posterior_cg(
        kernel, mesh=mesh_flat, noise_variance=1e-4, tol=1e-10,
        max_iters=200, n_true=n_uneven,
    )
    mean_g, var_g, _, _, _ = cg_solver(kernel.init_params(), xg_u, yg_u, xt_g)
    np.testing.assert_allclose(
        multihost.fetch_replicated(mean_g), np.asarray(oracle.mean), atol=1e-6
    )
    np.testing.assert_allclose(
        multihost.fetch_replicated(var_g), np.asarray(oracle.var), atol=1e-6
    )

    # r5: the Nyström-preconditioned path with the DATA axis spanning the
    # DCN boundary — landmark assembly + the r x k preconditioner psum
    # cross hosts, segmented resume included (two bounded segments)
    segs = parallel.make_posterior_cg_segments(
        kernel, mesh=mesh_flat, noise_variance=1e-4, tol=1e-10,
        max_iters=200, segment_iters=4, n_true=n_uneven,
        preconditioner="nystrom", precond_rank=8,
    )
    pre = segs["build_pre"](kernel.init_params(), xg_u)
    st_n, _bn = segs["start"](kernel.init_params(), xg_u, yg_u, xt_g, pre)
    for _ in range(20):
        if float(multihost.fetch_replicated(st_n.resnorm)) <= 1e-10 * 10:
            break
        prev = int(multihost.fetch_replicated(st_n.iters))
        st_n = segs["cont"](kernel.init_params(), xg_u, yg_u, xt_g, pre, st_n)
        if int(multihost.fetch_replicated(st_n.iters)) == prev:
            break
    mean_n, var_n, _a, _it, _rn = segs["finish"](
        kernel.init_params(), xg_u, yg_u, xt_g, st_n
    )
    np.testing.assert_allclose(
        multihost.fetch_replicated(mean_n), np.asarray(oracle.mean), atol=1e-6
    )
    np.testing.assert_allclose(
        multihost.fetch_replicated(var_n), np.asarray(oracle.var), atol=1e-6
    )

    # ---- sharded-array checkpointing: per-shard save, global restore
    # (VERDICT r2 missing #3: device_get on a non-fully-addressable array)
    assert not yg_u.is_fully_addressable
    ck_sh = os.path.join(workdir, "ckpt_sharded")
    checkpoint.save(ck_sh, {"y": yg_u, "step": np.asarray(3)}, step=3)
    multihost.sync_hosts("sharded-saved")
    like = {"y": yg_u, "step": np.asarray(0)}
    back_sh = checkpoint.restore(ck_sh, like, step=3)
    assert not back_sh["y"].is_fully_addressable
    np.testing.assert_allclose(
        multihost.global_to_host_local(back_sh["y"]),
        yu_p[rows],
    )
    # restored array is usable in the same sharded programs
    diff = jnp.max(jnp.abs(back_sh["y"] - yg_u))
    assert float(multihost.fetch_replicated(diff)) == 0.0

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
