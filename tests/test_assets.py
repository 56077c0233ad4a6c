"""The shipped retrained regressor artifact loads and behaves as expected."""

import numpy as np
import jax.numpy as jnp

from jrr_tpu import assets
from jrr_tpu.ops import jreg


def test_retrained_regressor_loads():
    j = assets.load_retrained_j_regressor()
    assert j.shape == (17, 6890)
    assert j.dtype == np.float32
    # It is near-sparse with a few negative entries (pre-ReLU raw weights).
    assert (j != 0).mean() < 0.05


def test_retrained_regressor_normalizes_row_stochastic():
    j = jnp.asarray(assets.load_retrained_j_regressor())
    n = jreg.normalize_jreg(j)
    np.testing.assert_allclose(np.asarray(n).sum(axis=1), 1.0, atol=1e-5)
    assert np.all(np.asarray(n) >= 0)
