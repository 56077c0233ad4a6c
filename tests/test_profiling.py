"""Profiling utilities."""

import jax
import jax.numpy as jnp

from jrr_tpu.utils import profiling


def test_step_timer():
    timer = profiling.StepTimer(frames_per_step=4, warmup=1)
    x = jnp.ones((8, 8))
    f = jax.jit(lambda a: a @ a)
    for _ in range(4):
        timer.tick(f(x))
    r = timer.rates()
    assert r["steps_per_sec"] > 0
    assert abs(r["frames_per_sec"] - 4 * r["steps_per_sec"]) < 1e-6


def test_log_compile_time():
    stats = profiling.log_compile_time(lambda a: a * 2, jnp.arange(4.0))
    assert set(stats) == {"lower_s", "compile_s", "first_run_s"}
    assert all(v >= 0 for v in stats.values())


def test_annotate_context():
    with profiling.annotate("test-region"):
        jnp.ones(4).block_until_ready()
