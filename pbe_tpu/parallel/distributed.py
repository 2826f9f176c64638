"""Multi-process (multi-host) runtime initialization + host-local data
sharding.

The reference runs multi-device training by spawning one rank per GPU and
initializing NCCL (main.py:224,311-327; train.sh sets the NCCL env). The
JAX-native equivalent is one *process per host*: every process calls
``jax.distributed.initialize`` against a shared coordinator, after which
``jax.devices()`` is the global device list and a single jitted SPMD
program spans all hosts — XLA's collectives replace NCCL.

Data never leaves its host: each process loads only its shard of the
global batch and wraps it into a global jax.Array with
``jax.make_array_from_process_local_data`` (the addressable shards stay
on the local devices; no cross-host gather happens).

Env contract (mirrors the reference's torchrun-style env):

    PBE_COORDINATOR      host:port of process 0 (aka JAX_COORDINATOR_ADDRESS)
    PBE_NUM_PROCESSES    total process count
    PBE_PROCESS_ID       this process's rank
    PBE_LOCAL_DEVICE_IDS  optional comma list passed to initialize()
    PBE_DIST_BACKEND     cpu collectives impl for CPU testing ("gloo")

On Cloud TPU pods all four are discoverable from the TPU metadata and
``jax.distributed.initialize()`` may be called with no arguments — we do
that when PBE_MULTIHOST=1 is set without explicit coordinates.
"""
from __future__ import annotations

import os
from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_initialized = False


def maybe_initialize() -> bool:
    """Initialize the JAX distributed runtime when the env asks for it.

    Returns True when running multi-process (after initialize), False for
    the default single-process path. Must be called before any backend
    use (first jax.devices()/jnp op) — typically first thing in an entry
    point; probing jax.process_count() here would itself initialize the
    backend, hence the module flag. Safe to call twice (no-op after the
    first).
    """
    global _initialized
    if _initialized:
        return jax.process_count() > 1
    coord = os.environ.get("PBE_COORDINATOR") or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    nproc = int(os.environ.get("PBE_NUM_PROCESSES", "0") or 0)
    multihost = os.environ.get("PBE_MULTIHOST", "") not in ("", "0")
    if not coord and not multihost:
        return False

    backend = os.environ.get("PBE_DIST_BACKEND", "")
    if backend:
        # CPU cross-process collectives (the hardware-free test path)
        jax.config.update("jax_cpu_collectives_implementation", backend)

    kwargs: dict[str, Any] = {}
    if coord:
        kwargs["coordinator_address"] = coord
    if nproc:
        kwargs["num_processes"] = nproc
    pid = os.environ.get("PBE_PROCESS_ID")
    if pid is not None:
        kwargs["process_id"] = int(pid)
    local = os.environ.get("PBE_LOCAL_DEVICE_IDS")
    if local:
        kwargs["local_device_ids"] = [int(x) for x in local.split(",")]
    jax.distributed.initialize(**kwargs)
    _initialized = True
    return jax.process_count() > 1


def is_main_process() -> bool:
    """True on the rank that should own logging/printing (rank 0)."""
    return jax.process_index() == 0


def host_local_to_global(
    batch: Any, mesh: Mesh, axis_name: str = "data"
) -> Any:
    """Promote a pytree of per-process host-local numpy batches to global
    jax.Arrays sharded over ``axis_name`` along dim 0.

    Each process passes its own slice of the global batch (global batch =
    concatenation over processes in rank order); the result is a global
    array whose addressable shards live on this process's devices. This is
    the JAX replacement for the reference's per-rank DataLoader +
    DistributedSampler (main.py:311-327).
    """
    sharding = NamedSharding(mesh, P(axis_name))

    def promote(x):
        return jax.make_array_from_process_local_data(sharding, x)

    return jax.tree.map(promote, batch)


def per_process_batch_size(global_batch: int) -> int:
    n = jax.process_count()
    if global_batch % n:
        raise ValueError(
            f"global batch {global_batch} not divisible by {n} processes"
        )
    return global_batch // n
