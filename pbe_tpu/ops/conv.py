"""Small-spatial 3x3 conv reformulated as im2col + one MXU matmul.

XLA's native conv schedule underutilizes the MXU at the UNet's deep
levels: measured on-chip (chained-marginal, `benchmarks/ds8_conv_r5.
jsonl`, PERF.md §9) the v1 geometry 3x3 convs run at 61% of roofline
at ds4 (16², 1280ch) and 29% at ds8 (8², 1280ch), while the SAME conv
expressed as 9 shifted views concatenated to a (B·H·W, 9C) matrix
times the (9C, O) weight matrix hits 86% / 49% — 1.4–1.7x faster and
**bitwise equal** to `lax.conv_general_dilated` (measured max rel err
0.0 at both geometries; both paths accumulate the identical bf16
operand products in fp32 on the MXU).

`conv_general_dilated_small` is an `nn.Conv(conv_general_dilated=…)`
override (same calling convention as `ops/quant.py`'s int8 override):
it applies the im2col formulation exactly when the conv is a stride-1,
undilated, ungrouped 3x3 NHWC/HWIO conv with symmetric 1-pixel padding
and H·W ≤ MAX_SPATIAL, and falls back to `lax.conv_general_dilated`
otherwise — so wiring it in can only reroute the deep-level UNet convs
the probe measured, never change semantics.

Activation mirrors ops/quant.py: a thread-local `small_spatial()`
context consulted at *trace* time by `models/unet._conv`. EditPipeline
enables it for every edit program it traces (exact-math rewrite, on by
default; set PBE_TPU_SMALL_CONV=0 to trace with XLA's native schedule
instead). The training step does not enable it: the probe measured the
forward only, and the im2col backward (scatter-add vs cuDNN-style
transposed conv) is unmeasured.

Reference counterpart: none — the torch reference leaves conv
scheduling to cuDNN (ldm/modules/diffusionmodules/openaimodel.py);
this is TPU-schedule work the reference has no analogue of.
"""
from __future__ import annotations

import os
import threading
from contextlib import contextmanager

import jax
import jax.numpy as jnp

_TLS = threading.local()

# Largest H·W the reformulation pays at (the probe shows the native
# schedule is already at 61-76% of roofline for 32²+ extents, and the
# 9x input duplication starts to cost real HBM traffic there).
MAX_SPATIAL = 16 * 16


def is_active() -> bool:
    return getattr(_TLS, "depth", 0) > 0


@contextmanager
def small_spatial():
    """Trace convs with the small-spatial im2col formulation (exact)."""
    if os.environ.get("PBE_TPU_SMALL_CONV", "1") == "0":
        yield
        return
    _TLS.depth = getattr(_TLS, "depth", 0) + 1
    try:
        yield
    finally:
        _TLS.depth -= 1


def conv_general_dilated_small(lhs, rhs, window_strides, padding,
                               lhs_dilation=None, rhs_dilation=None,
                               dimension_numbers=None,
                               feature_group_count=1, batch_group_count=1,
                               precision=None, preferred_element_type=None):
    """`nn.Conv.conv_general_dilated` override: im2col formulation for
    gated small-spatial 3x3 convs, exact `lax` fallback otherwise."""
    def plain():
        return jax.lax.conv_general_dilated(
            lhs, rhs, window_strides, padding, lhs_dilation=lhs_dilation,
            rhs_dilation=rhs_dilation, dimension_numbers=dimension_numbers,
            feature_group_count=feature_group_count,
            batch_group_count=batch_group_count, precision=precision,
            preferred_element_type=preferred_element_type)

    if lhs.ndim != 4 or rhs.ndim != 4 or rhs.shape[:2] != (3, 3):
        return plain()
    if tuple(window_strides) != (1, 1):
        return plain()
    if feature_group_count != 1 or batch_group_count != 1:
        return plain()
    if lhs_dilation is not None and tuple(lhs_dilation) != (1, 1):
        return plain()
    if rhs_dilation is not None and tuple(rhs_dilation) != (1, 1):
        return plain()
    if isinstance(padding, str):
        if padding != "SAME":  # SAME == ((1,1),(1,1)) for 3x3 stride 1
            return plain()
    elif tuple(map(tuple, padding)) != ((1, 1), (1, 1)):
        return plain()
    # verify NHWC/HWIO/NHWC instead of assuming it (same guard as
    # quant.conv_general_dilated_int8 — a different layout would make the
    # reshape below silently wrong)
    try:
        dn = jax.lax.conv_dimension_numbers(
            lhs.shape, rhs.shape, dimension_numbers)
    except (TypeError, ValueError):
        return plain()
    if (tuple(dn.lhs_spec), tuple(dn.rhs_spec), tuple(dn.out_spec)) != (
            (0, 3, 1, 2), (3, 2, 0, 1), (0, 3, 1, 2)):
        return plain()
    b, h, w, cin = lhs.shape
    cout = rhs.shape[3]
    if h * w > MAX_SPATIAL or rhs.shape[2] != cin:
        return plain()

    xp = jnp.pad(lhs, ((0, 0), (1, 1), (1, 1), (0, 0)))
    # tap order (dy, dx) matches HWIO's (ky, kx) reshape order below
    cols = jnp.concatenate(
        [xp[:, dy:dy + h, dx:dx + w, :]
         for dy in range(3) for dx in range(3)], axis=-1)
    out = jax.lax.dot(
        cols.reshape(b * h * w, 9 * cin), rhs.reshape(9 * cin, cout),
        precision=precision, preferred_element_type=preferred_element_type)
    return out.reshape(b, h, w, cout)
