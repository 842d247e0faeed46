"""Class-parallel distributed multi-class Laplace (parallel/multiclass.py):
must match the single-chip ``gp.fit_multiclass`` on every mesh size, including
class counts that do not divide the mesh axis (masked dummy-class padding).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussian_process_tpu import gp, ops, parallel


def _blobs(rng, n=24, num_classes=3, d=2):
    centers = rng.uniform(-4, 4, size=(num_classes, d))
    x = np.concatenate(
        [centers[c] + 0.5 * rng.standard_normal((n // num_classes, d))
         for c in range(num_classes)]
    )
    y = np.repeat(np.arange(num_classes), n // num_classes)
    return x, y


@pytest.mark.parametrize("mesh_size,num_classes", [(1, 3), (2, 4), (4, 3), (8, 5)])
def test_sharded_multiclass_matches_single_chip(rng, mesh_size, num_classes):
    x, y = _blobs(rng, n=num_classes * 8, num_classes=num_classes)
    kernel = ops.RBF()
    params = {"sigma": jnp.asarray(1.0), "lengthscale": jnp.asarray(1.0)}

    ref = gp.fit_multiclass(kernel, params, x, y, num_classes, max_iters=50)

    mesh = parallel.make_mesh(restart=1, data=mesh_size,
                              devices=jax.devices()[:mesh_size])
    got = parallel.fit_multiclass_sharded(
        kernel, params, x, y, num_classes, mesh=mesh, max_iters=50
    )

    assert bool(got.converged) == bool(ref.converged)
    np.testing.assert_allclose(
        np.asarray(got.f_mode), np.asarray(ref.f_mode), atol=1e-8
    )
    np.testing.assert_allclose(np.asarray(got.pi), np.asarray(ref.pi), atol=1e-8)
    np.testing.assert_allclose(float(got.lml), float(ref.lml), rtol=1e-8)


def test_sharded_multiclass_prediction_accuracy(rng):
    """End-to-end: distributed fit feeds the standard batched prediction and
    classifies blobs essentially perfectly (the reference's printed metric
    [ref: GP_multi_classification.py:253])."""
    xa, ya = _blobs(rng, n=45, num_classes=3)
    perm = rng.permutation(len(ya))
    x, y = xa[perm[:30]], ya[perm[:30]]
    x_test, y_test = xa[perm[30:]], ya[perm[30:]]
    kernel = ops.RBF()
    params = {"sigma": jnp.asarray(1.0), "lengthscale": jnp.asarray(1.0)}

    mesh = parallel.make_mesh(restart=1, data=4, devices=jax.devices()[:4])
    state = parallel.fit_multiclass_sharded(
        kernel, params, x, y, 3, mesh=mesh, max_iters=50
    )
    pred = gp.predict_multiclass(kernel, params, state, x, y, x_test, 3)
    acc = float(np.mean(np.asarray(pred.label) == y_test))
    assert acc >= 0.9
