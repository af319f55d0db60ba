"""Poincare-ball op tests: map inverses, gyro-identities, hyperbolic qconv."""

import numpy as np
import jax.numpy as jnp

from quan_ultralytics_tpu.ops.qgeo import expmap0, logmap0, mobius_add, poincare_qconv2d


def test_exp_log_inverse():
    rng = np.random.default_rng(0)
    v = rng.normal(size=(5, 4)).astype(np.float32) * 0.3
    x = expmap0(jnp.asarray(v))
    assert float(jnp.linalg.norm(x, axis=-1).max()) < 1.0  # inside the ball
    v2 = logmap0(x)
    np.testing.assert_allclose(np.asarray(v2), v, rtol=1e-4, atol=1e-5)


def test_mobius_identity_and_inverse():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(4, 4)).astype(np.float32) * 0.2
    zero = jnp.zeros_like(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(mobius_add(zero, jnp.asarray(x))), x, rtol=1e-5)
    # x (+) (-x) = 0
    res = mobius_add(jnp.asarray(x), jnp.asarray(-x))
    np.testing.assert_allclose(np.asarray(res), 0.0, atol=1e-5)


def test_poincare_qconv_stays_in_ball():
    rng = np.random.default_rng(2)
    v = rng.normal(size=(1, 6, 6, 4, 4)).astype(np.float32) * 0.3
    x = expmap0(jnp.moveaxis(jnp.asarray(v), -2, -1))
    x = jnp.moveaxis(x, -1, -2)
    w = jnp.asarray(rng.normal(size=(4, 3, 3, 4, 4)).astype(np.float32) * 0.2)
    y = poincare_qconv2d(x, w, padding=1)
    assert y.shape == x.shape
    norms = jnp.linalg.norm(jnp.moveaxis(y, -2, -1), axis=-1)
    assert float(norms.max()) < 1.0
    assert np.isfinite(np.asarray(y)).all()
