"""Device mesh + sharding rules — the TPU-native replacement for the
reference's NCCL/DeepSpeed layer (SURVEY.md section 5 "Distributed
communication backend"; main.py:311-327, train.sh NCCL env).

Design: single-controller JAX SPMD.
  * one mesh axis ``data`` over ICI — the model is a 512^2 image UNet whose
    activations fit one chip, so parity needs data parallelism only
    (SURVEY.md section 2: the reference has DP/ZeRO and nothing else).
  * batch sharded on ``data``; params replicated; gradients all-reduced by
    XLA-inserted psum (jit + shardings does this automatically).
  * ZeRO analogue: optimizer-state leaves large enough to matter are sharded
    on ``data`` along their first divisible axis (DeepSpeed stage-1/2
    equivalent of main.py:312). XLA inserts the all-gathers around the
    update; HBM saved = (1 - 1/N) of Adam m/v.
"""
from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices=None, axis_name: str = "data") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def make_multislice_mesh(
    num_slices: int, devices=None,
    axis_names: tuple[str, str] = ("dcn", "data"),
) -> Mesh:
    """Two-axis mesh for multi-slice pods: the outer ``dcn`` axis spans
    slices (data-center network), the inner ``data`` axis rides ICI within a
    slice. Devices must be ordered slice-major (jax.devices() is, on real
    multi-slice systems). Batch sharded over BOTH axes keeps the gradient
    all-reduce hierarchical: XLA emits the intra-slice psum over ICI first,
    then the small cross-slice reduction over DCN — the layout rule from the
    scaling playbook (DESIGN.md: "a second mesh axis for DCN multi-slice is
    a config change, not a redesign")."""
    devices = list(devices if devices is not None else jax.devices())
    if len(devices) % num_slices:
        raise ValueError(
            f"{len(devices)} devices do not split into {num_slices} slices"
        )
    arr = np.asarray(devices).reshape(num_slices, len(devices) // num_slices)
    return Mesh(arr, axis_names)


def multislice_batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch sharded over (dcn, data) jointly — global batch = sum of
    per-slice batches, matching single-axis DP semantics exactly."""
    return NamedSharding(mesh, P(tuple(mesh.axis_names)))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard the leading (batch) dim of every leaf."""
    return NamedSharding(mesh, P(axis_name))


def zero_shard_opt_state(
    opt_state: Any, mesh: Mesh, axis_name: str = "data",
    min_size: int = 2**16,
) -> Any:
    """Sharding pytree for optimizer state: big leaves sharded on their first
    axis divisible by the mesh, scalars/small leaves replicated."""
    n = mesh.shape[axis_name]

    def rule(leaf):
        shape = getattr(leaf, "shape", ())
        size = int(np.prod(shape)) if shape else 1
        if size >= min_size:
            for dim, s in enumerate(shape):
                if s % n == 0:
                    spec = [None] * len(shape)
                    spec[dim] = axis_name
                    return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree.map(rule, opt_state)
