"""Profiling utilities."""
import jax.numpy as jnp
import numpy as np

from pbe_tpu.utils.profiling import StepTimer, compiled_flops, count_params, format_params


def test_step_timer():
    t = StepTimer()
    for _ in range(3):
        t.start()
        x = jnp.ones((100, 100)) @ jnp.ones((100, 100))
        t.stop(sync_array=x)
    s = t.summary()
    assert s["n"] == 3 and s["p50_s"] > 0 and s["p90_s"] >= s["p50_s"]


def test_param_accounting():
    tree = {"a": np.zeros((10, 10)), "b": {"c": np.zeros(5)}}
    assert count_params(tree) == 105
    assert format_params(tree).endswith("M params")


def test_compiled_flops_matmul():
    n = 64
    flops = compiled_flops(lambda a, b: a @ b, jnp.ones((n, n)), jnp.ones((n, n)))
    if flops is not None:  # cost analysis availability is backend-dependent
        assert flops >= 2 * n**3 * 0.5  # within 2x of the analytic count
