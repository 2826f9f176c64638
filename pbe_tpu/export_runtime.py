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
    compilation cache makes that warm across processes).
    """
    from jax import export as jexport

    exported = jexport.deserialize(bytearray(blob))
    return jax.jit(exported.call)


def save_edit_program(path: str, blob: bytes) -> None:
    with open(path, "wb") as f:
        f.write(blob)


def load_edit_program_file(path: str) -> Callable:
    with open(path, "rb") as f:
        return load_edit_program(f.read())
