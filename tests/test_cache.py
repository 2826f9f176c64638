"""Persistent compilation cache helper (pbe_tpu/utils/cache.py)."""
import os
import subprocess
import sys


def _run(env_extra, code):
    # Pin the platform in the ENV: the harness exports JAX_PLATFORMS=axon
    # and enable_compilation_cache() re-syncs config from the env, which
    # would clobber the in-process cpu override and run the subprocess
    # against the remote TPU tunnel (hanging the test when it is down).
    env = {**os.environ, "JAX_PLATFORMS": "cpu", **env_extra}
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, env=env, cwd="/root/repo", timeout=240)
    assert r.returncode == 0, r.stderr[-2000:]
    return r.stdout.strip().splitlines()[-1]


CODE = """
import jax
jax.config.update("jax_platforms", "cpu")
from pbe_tpu.utils.cache import enable_compilation_cache
print(enable_compilation_cache())
"""


def test_env_off_disables():
    assert _run({"PBE_COMPILATION_CACHE": "off"}, CODE) == "None"


def test_env_dir_wins(tmp_path):
    d = str(tmp_path / "cc")
    assert _run({"PBE_COMPILATION_CACHE": d}, CODE) == d
    assert os.path.isdir(d)


def test_respects_existing_config(tmp_path):
    d = str(tmp_path / "user")
    code = f"""
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", {d!r})
from pbe_tpu.utils.cache import enable_compilation_cache
print(enable_compilation_cache())
"""
    assert _run({}, code) == d


def test_cache_round_trip(tmp_path):
    d = str(tmp_path / "rt")
    code = f"""
import jax, jax.numpy as jnp, time
jax.config.update("jax_platforms", "cpu")
from pbe_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache({d!r})
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.jit(lambda x: (x @ x).sum()).lower(jnp.ones((64, 64))).compile()
import os
print(len(os.listdir({d!r})) > 0)
"""
    assert _run({}, code) == "True"
