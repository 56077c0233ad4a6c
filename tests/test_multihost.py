"""Multi-host wrappers degrade to single-process over the 8-device CPU pool."""

import numpy as np
import jax
import jax.numpy as jnp

from jrr_tpu.parallel import multihost


def test_initialize_noop_single_process():
    multihost.initialize()  # must not raise
    info = multihost.process_info()
    assert info["process_count"] == 1
    assert info["global_device_count"] == 8


def test_global_batch_from_local():
    mesh = multihost.global_mesh()
    local = {"x": np.arange(16, dtype=np.float32).reshape(16, 1)}
    global_tree = multihost.global_batch_from_local(mesh, local)
    assert global_tree["x"].shape == (16, 1)
    assert len({s.device for s in global_tree["x"].addressable_shards}) == 8
    np.testing.assert_array_equal(np.asarray(global_tree["x"]), local["x"])
    # Usable inside a jitted computation with replicated output.
    total = jax.jit(lambda t: jnp.sum(t["x"]))(global_tree)
    assert float(total) == float(local["x"].sum())
