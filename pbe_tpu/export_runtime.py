"""Runtime loader for frozen edit programs (see pipelines/export.py).

Kept as a light top-level module on purpose: a serving host that consumes
an exported StableHLO artifact needs jax + this file only — importing it
must not pull in flax or the model stack (pbe_tpu/__init__ is lazy;
pbe_tpu.pipelines.__init__ is not, which is why this does not live there).
"""
from __future__ import annotations

from typing import Callable

import jax


def load_edit_program(blob: bytes) -> Callable:
    """bytes -> callable(variables, image, mask, ref, x_T, scale, rng).

    jit-wrapped so XLA compiles it once per process (and the persistent
    compilation cache makes that warm across processes). The returned
    callable exposes ``in_avals`` (the flat input ShapeDtypeStructs —
    variables leaves first, then image/mask/ref/x_T/scale/rng) so a
    deployment host can cast inputs to the frozen dtypes (e.g. bfloat16)
    without any model code or manifest."""
    from jax import export as jexport

    exported = jexport.deserialize(bytearray(blob))
    jfn = jax.jit(exported.call)

    def fn(*args):
        return jfn(*args)

    fn.in_avals = exported.in_avals
    return fn


def save_edit_program(path: str, blob: bytes) -> None:
    with open(path, "wb") as f:
        f.write(blob)


def load_edit_program_file(path: str) -> Callable:
    with open(path, "rb") as f:
        return load_edit_program(f.read())


def save_params_npz(path: str, variables: dict) -> None:
    """Flatten a (nested-dict) variables pytree into one .npz — a portable,
    pickle-free way to ship parameters next to the frozen program."""
    import numpy as np

    flat = {}

    def walk(node, prefix):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, prefix + (str(k),))
        else:
            flat["/".join(prefix)] = np.asarray(node)

    walk(variables, ())
    np.savez(path, **flat)


def load_params_npz(path: str, to_device: bool = True) -> dict:
    """Inverse of :func:`save_params_npz`.

    to_device=True (default) transfers the whole tree to the default device
    once at load. This matters: passing host (numpy) leaves to the frozen
    program re-uploads every parameter on EVERY call — at v1 geometry that
    is ~5 GB per invocation and made the round-4 warm call 176 s vs the
    live pipeline's ~1 s. A deployment host should pay the H2D cost exactly
    once. Pass to_device=False only for host-side inspection."""
    import numpy as np

    tree: dict = {}
    with np.load(path) as data:
        for key in data.files:
            node = tree
            parts = key.split("/")
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = data[key]
    if to_device:
        tree = jax.device_put(tree)
    return tree
