"""Persistent XLA compilation cache.

The full 512^2 edit pipeline takes minutes to compile (~17 min over the
axon dev tunnel; tens of seconds on a local-PCIe host). XLA's persistent
compilation cache serializes the compiled executable keyed by (HLO,
flags, backend version), so every later process with the same geometry
loads it in seconds — measured 0.98 s -> 0.06 s cross-process on the
tunnel. All pbe_tpu entry points call :func:`enable_compilation_cache`.

Env control: ``PBE_COMPILATION_CACHE=<dir>`` overrides the location;
``PBE_COMPILATION_CACHE=off`` (or ``0``/``none``) disables. An explicit
``jax_compilation_cache_dir`` already set by the user is respected.
"""
from __future__ import annotations

import os

_DEFAULT = os.path.expanduser("~/.cache/pbe_tpu/xla")


def sync_platform_from_env() -> None:
    """Honor ``JAX_PLATFORMS`` even on hosts whose sitecustomize imports jax
    (registering a remote-TPU backend) before env vars can take effect —
    e.g. ``JAX_PLATFORMS=cpu`` to drive a CLI on a virtual CPU mesh."""
    want = os.environ.get("JAX_PLATFORMS")
    if want:
        import jax

        try:
            jax.config.update("jax_platforms", want)
        except Exception:
            pass


def enable_compilation_cache(path: str | None = None) -> str | None:
    """Point jax at a persistent compile cache; returns the dir (None if
    disabled). Safe to call multiple times and before/after backend init.

    Also syncs ``JAX_PLATFORMS`` from the environment (every CLI calls this
    first, so platform selection works uniformly)."""
    sync_platform_from_env()
    env = os.environ.get("PBE_COMPILATION_CACHE", "")
    if env.lower() in ("0", "off", "none", "false"):
        return None
    import jax

    try:
        current = jax.config.jax_compilation_cache_dir
    except AttributeError:  # pragma: no cover - very old jax
        return None
    if current:  # user already configured one — leave it alone
        return current
    path = env or path or _DEFAULT
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # default min_compile_time (1 s) skips tiny programs; keep it, but make
    # sure size threshold doesn't exclude the big pipeline executables
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return path
