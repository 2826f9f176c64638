"""w8a8 int8 quantized matmul/conv execution for serving.

v5e's MXU runs int8xint8->int32 at 394 TOPS vs 197 TFLOP/s bf16. Probe
measurements at the UNet's geometries (benchmarks/int8_probe_r3.jsonl,
marginal-cost chains on the chip): 341 TOPS on a bare 4096^3 matmul (87%
of peak), and w8a8 conv3x3 *including in-program activation
quantization* 2.08x faster at ds=2, 1.92x at ds=4, 1.30x at ds=1 — but a
3x regression at 8x8 spatial, so small shapes are gated out below.

Scheme: symmetric per-row activation scales (amax over each example's
non-batch axes / 127, computed in-program each call — per-row rather
than per-tensor so a request's quantization grid never depends on its
co-batched neighbors, preserving EditServer's batch-invariance
guarantee), symmetric per-output-channel weight scale. Both
quantize at call time — weights stay fp32 in the checkpoint, so one set
of variables serves both the fp and int8 programs, and XLA folds the
weight-side quantization into the program like any other elementwise op
(weight traffic is unchanged: read once either way).

Execution mode is a trace-time switch (`quantized()` context): flax
module code stays untouched except that the UNet's `_conv`/`_dense`
helpers pass these functions as `nn.Conv.conv_general_dilated` /
`nn.Dense.dot_general` overrides when the mode is active. The pipeline
activates the context around program tracing only (EditPipeline caches
one compiled program per (config, quantize) key), so training and every
non-opted path are untouched.

Quality: with per-channel weight scales this is standard w8a8
post-training quantization — layer-level relative error is tested; edit-
level quality validation against the paper metrics requires trained
weights (the zero-egress environment has none) and is a documented
weights-arrival step. The mode is opt-in everywhere (--quantize int8).

Calibrated static scales (round 5): the round-4 end-to-end bisect showed
the in-graph regression comes from the runtime quantize boundaries (each
eligible op gains an amax reduction over its full activation before the
int8 op can start — PERF.md §8). ``quantized("int8", static=scales)``
replaces every runtime amax with constants recorded by
:func:`calibration` (+ :func:`scales_from_records`) so quantize/rescale
become constant-scale elementwise ops XLA can fuse into the neighboring
producers/consumers — the standard PTQ deployment shape. Scales are
consumed in trace order (the op stream of one UNet call), verified on
context exit. Entry points: EditPipeline.calibrate_int8 / --quantize
int8-static on inference.py, serve.py, bench_serving.py, bench_sweep.py.

No reference counterpart: zhanwenchen/pbe serves fp16/fp32 only.
"""
from __future__ import annotations

import dataclasses
import threading
from contextlib import contextmanager

import jax
import jax.numpy as jnp
import numpy as np

# minimum sizes for the int8 path to win on the MXU (probe-derived):
# 8x8 spatial convs regressed 3x; tiny contractions never tile well.
MIN_SPATIAL = 256      # H*W of the conv input
MIN_CHANNELS = 64      # conv in/out channels
MIN_CONTRACT = 128     # dense contraction dim
MIN_ROWS = 256         # dense M dim (rows hitting the MXU)

# trace-time mode stack; thread-local so two pipelines tracing
# concurrently (e.g. one quantized server, one fp) can't leak the
# context into each other's program
_TLS = threading.local()


@dataclasses.dataclass(frozen=True)
class QuantSpec:
    """Which ops quantize and at what scale granularity — the attribution
    knobs for the end-to-end int8 benches (direct calls to the override
    functions outside any context use the defaults)."""

    mode: str = "int8"
    convs: bool = True      # w8a8 the eligible 3x3 convs
    dense: bool = True      # w8a8 the eligible Dense matmuls
    per_row: bool = True    # per-row activation scales (batch-invariant);
    #                         False = legacy per-tensor (probe's scheme)
    # calibrated static scales (the standard PTQ deployment shape): a
    # tuple of (act_scale: float, weight_scales: tuple[float, ...]) per
    # eligible op, consumed in trace order. When set, NO runtime amax is
    # computed — quantize/rescale become constant-scale elementwise ops
    # XLA can fuse into the neighboring producers/consumers, which is
    # exactly the boundary cost the round-4 bisect identified as the
    # in-graph int8 regression (PERF.md §8). Scales come from
    # :func:`calibration` + :func:`scales_from_records`. Input-independent
    # by construction, so batch invariance is trivial.
    static: tuple | None = None


class _Ctx:
    """One active quantization context: the spec plus trace-order state
    (eligible-op counter for static-scale consumption; amax records for
    calibration). The UNet may trace more than once under one context
    (PLMS warm-up steps trace the eps closure repeatedly), so static
    scales are consumed modulo one trace's op count and the exit check
    only requires the total to be a whole number of traces."""

    def __init__(self, spec: QuantSpec):
        self.spec = spec
        self.count = 0
        self.records: list = []  # calibration: traced (act_amax, w_amax)

    def next_static(self):
        st = self.spec.static
        idx = self.count % len(st)
        self.count += 1
        return st[idx]


def _stack() -> list:
    s = getattr(_TLS, "stack", None)
    if s is None:
        s = _TLS.stack = []
    return s


@contextmanager
def quantized(mode: str | None = "int8", **knobs):
    """Trace-time switch: programs traced inside quantize eligible
    matmuls/convs. No effect on already-compiled programs. ``knobs``
    (convs/dense/per_row/static) select a :class:`QuantSpec` variant;
    ``static`` activates the calibrated constant-scale path (see
    :class:`QuantSpec`)."""
    if mode is None:
        yield
        return
    if mode != "int8":
        raise ValueError(f"unknown quantization mode {mode!r}")
    ctx = _Ctx(QuantSpec(mode=mode, **knobs))
    s = _stack()
    s.append(ctx)
    ok = False
    try:
        yield
        ok = True
    finally:
        s.pop()
        st = ctx.spec.static
        # only verify on clean exit — a trace error mid-body leaves a
        # partial count, and raising here would mask the real exception
        if ok and st and ctx.count % len(st) != 0:
            raise RuntimeError(
                f"static-scale mismatch: trace consumed {ctx.count} eligible "
                f"ops, not a multiple of the {len(st)} calibrated scales — "
                "the calibration program and the serving program disagree "
                "on which ops quantize (did the model config or the "
                "convs/dense knobs change since calibration?)")


@contextmanager
def calibration(convs: bool = True, dense: bool = True):
    """Record per-eligible-op activation/weight amax while tracing the fp
    program. Use INSIDE a jitted function and return the collected traced
    values so each call yields concrete amaxes::

        def calib_fn(variables, x, t, ctx):
            with quant.calibration() as col:
                eps = model.apply(variables, x, t, ctx, method=...)
            return eps, col.records   # pytree of traced arrays

    Run over calibration batches, elementwise-max the records on the
    host, then :func:`scales_from_records` -> ``static=`` for
    :func:`quantized`. The convs/dense knobs MUST match the serving
    context so the op order and count line up."""
    ctx = _Ctx(QuantSpec(mode="calib", convs=convs, dense=dense))
    s = _stack()
    s.append(ctx)
    try:
        yield ctx
    finally:
        s.pop()


def scales_from_records(per_batch_records) -> tuple:
    """Reduce calibration records to the static-scale tuple.

    ``per_batch_records``: iterable over batches, each a list of
    (act_amax scalar, w_amax (cout,)-vector) numpy/jax arrays in op
    order. Returns tuple[(act_scale, tuple(weight_scales))] with the
    amax maxed across batches and divided by 127 (symmetric int8)."""
    per_batch = [list(r) for r in per_batch_records]
    n = len(per_batch[0])
    out = []
    for i in range(n):
        a = max(float(np.asarray(r[i][0])) for r in per_batch)
        w = np.max(np.stack([np.asarray(r[i][1], np.float32).reshape(-1)
                             for r in per_batch]), axis=0)
        out.append((max(a / 127.0, 1e-8),
                    tuple(float(x) for x in np.maximum(w / 127.0, 1e-8))))
    return tuple(out)


def is_active() -> bool:
    return bool(_stack())


def active_ctx() -> _Ctx | None:
    s = _stack()
    return s[-1] if s else None


def active_spec() -> QuantSpec | None:
    ctx = active_ctx()
    return ctx.spec if ctx else None


def _quantize_rows(x: jax.Array, reduce_axes: tuple[int, ...]):
    """Symmetric int8 with one scale per kept (non-reduced) index — for
    activations, reduce over everything but the batch axis so each
    example quantizes on its own grid (batch-invariant)."""
    xf = x.astype(jnp.float32)
    s = jnp.maximum(
        jnp.max(jnp.abs(xf), axis=reduce_axes, keepdims=True) / 127.0, 1e-8)
    q = jnp.clip(jnp.round(xf / s), -127.0, 127.0).astype(jnp.int8)
    return q, s


def _quantize_per_channel(w: jax.Array, channel_axis: int):
    wf = w.astype(jnp.float32)
    axes = tuple(a for a in range(w.ndim) if a != channel_axis)
    s = jnp.maximum(jnp.max(jnp.abs(wf), axis=axes, keepdims=True) / 127.0,
                    1e-8)
    q = jnp.clip(jnp.round(wf / s), -127.0, 127.0).astype(jnp.int8)
    return q, s


def dot_general_int8(lhs, rhs, dimension_numbers, precision=None,
                     preferred_element_type=None):
    """`nn.Dense.dot_general` override: w8a8 when eligible, else exact
    fp fallback. Supports the (last-dim x dim-0, no batch) contraction
    flax's Dense emits."""
    ((lc, rc), (lb, rb)) = dimension_numbers
    plain = lambda: jax.lax.dot_general(
        lhs, rhs, dimension_numbers, precision=precision,
        preferred_element_type=preferred_element_type)
    spec = active_spec() or QuantSpec()
    if not spec.dense:
        return plain()
    if (lb or rb or list(lc) != [lhs.ndim - 1] or list(rc) != [0]
            or rhs.ndim != 2):
        return plain()
    k, n = rhs.shape
    # gate on PER-EXAMPLE rows (exclude the leading batch axis): if the
    # total-row count decided eligibility, the same layer would run int8 in
    # a big serving bucket but fp in a small one, making a request's output
    # depend on its bucket — the batch-invariance bug class EditServer
    # guards against. Cost: tiny small-T denses (ds8 attention, time-embed)
    # stay fp at every batch size; they are a negligible FLOP share.
    m = int(np.prod(lhs.shape[1:-1])) if lhs.ndim > 2 else 1
    if k < MIN_CONTRACT or n < MIN_CONTRACT or m < MIN_ROWS:
        return plain()
    ctx = active_ctx()
    if ctx is not None and ctx.spec.mode == "calib":
        xf, wf = lhs.astype(jnp.float32), rhs.astype(jnp.float32)
        ctx.records.append((jnp.max(jnp.abs(xf)),
                            jnp.max(jnp.abs(wf), axis=0)))  # (n,)
        ctx.count += 1
        return plain()
    if spec.static is not None:
        s_act, s_w = ctx.next_static()
        if len(s_w) != n:
            raise RuntimeError(
                f"static weight-scale length {len(s_w)} != out dim {n}: "
                "calibration/serving op order misaligned")
        sw = jnp.asarray(s_w, jnp.float32)
        ql = jnp.clip(jnp.round(lhs.astype(jnp.float32) * (1.0 / s_act)),
                      -127.0, 127.0).astype(jnp.int8)
        qr = jnp.clip(jnp.round(rhs.astype(jnp.float32) / sw[None, :]),
                      -127.0, 127.0).astype(jnp.int8)
        acc = jax.lax.dot_general(ql, qr, dimension_numbers,
                                  preferred_element_type=jnp.int32)
        scale = (s_act * sw).reshape((1,) * (acc.ndim - 1) + (n,))
        return (acc.astype(jnp.float32) * scale).astype(lhs.dtype)
    # per-row activation scale (amax over the contraction axis only): each
    # output row's grid depends only on its own inputs -> batch-invariant
    ql, sl = _quantize_rows(
        lhs, reduce_axes=(lhs.ndim - 1,) if spec.per_row
        else tuple(range(lhs.ndim)))
    qr, sr = _quantize_per_channel(rhs, channel_axis=1)  # (1, n)
    acc = jax.lax.dot_general(ql, qr, dimension_numbers,
                              preferred_element_type=jnp.int32)
    scale = sl * sr.reshape((1,) * (acc.ndim - 1) + (n,))
    return (acc.astype(jnp.float32) * scale).astype(lhs.dtype)


def conv_general_dilated_int8(lhs, rhs, window_strides, padding,
                              lhs_dilation=None, rhs_dilation=None,
                              dimension_numbers=None,
                              feature_group_count=1, batch_group_count=1,
                              precision=None, preferred_element_type=None):
    """`nn.Conv.conv_general_dilated` override: w8a8 for NHWC/HWIO convs
    above the probe's break-even shapes, exact fp fallback otherwise."""
    plain = lambda: jax.lax.conv_general_dilated(
        lhs, rhs, window_strides, padding, lhs_dilation=lhs_dilation,
        rhs_dilation=rhs_dilation, dimension_numbers=dimension_numbers,
        feature_group_count=feature_group_count,
        batch_group_count=batch_group_count, precision=precision,
        preferred_element_type=preferred_element_type)
    spec = active_spec() or QuantSpec()
    if not spec.convs:
        return plain()
    if feature_group_count != 1 or batch_group_count != 1:
        return plain()
    if lhs.ndim != 4 or rhs.ndim != 4:
        return plain()
    # only handle the NHWC/HWIO/NHWC layout flax emits — anything else
    # would put the per-channel weight scales on the wrong axis, so verify
    # the dimension numbers instead of assuming them
    try:
        dn = jax.lax.conv_dimension_numbers(
            lhs.shape, rhs.shape, dimension_numbers)
    except (TypeError, ValueError):
        return plain()
    if (tuple(dn.lhs_spec), tuple(dn.rhs_spec), tuple(dn.out_spec)) != (
            (0, 3, 1, 2), (3, 2, 0, 1), (0, 3, 1, 2)):  # NHWC/HWIO/NHWC
        return plain()
    h, w, cin = lhs.shape[1], lhs.shape[2], lhs.shape[3]
    cout = rhs.shape[3]
    if (h * w < MIN_SPATIAL or cin < MIN_CHANNELS or cout < MIN_CHANNELS
            or rhs.shape[2] != cin):
        return plain()
    ctx = active_ctx()
    if ctx is not None and ctx.spec.mode == "calib":
        xf, wf = lhs.astype(jnp.float32), rhs.astype(jnp.float32)
        ctx.records.append((jnp.max(jnp.abs(xf)),
                            jnp.max(jnp.abs(wf), axis=(0, 1, 2))))  # (O,)
        ctx.count += 1
        return plain()
    if spec.static is not None:
        s_act, s_w = ctx.next_static()
        if len(s_w) != cout:
            raise RuntimeError(
                f"static weight-scale length {len(s_w)} != out channels "
                f"{cout}: calibration/serving op order misaligned")
        sw = jnp.asarray(s_w, jnp.float32)
        ql = jnp.clip(jnp.round(lhs.astype(jnp.float32) * (1.0 / s_act)),
                      -127.0, 127.0).astype(jnp.int8)
        qr = jnp.clip(jnp.round(rhs.astype(jnp.float32)
                                / sw.reshape(1, 1, 1, cout)),
                      -127.0, 127.0).astype(jnp.int8)
        acc = jax.lax.conv_general_dilated(
            ql, qr, window_strides, padding, lhs_dilation=lhs_dilation,
            rhs_dilation=rhs_dilation, dimension_numbers=dimension_numbers,
            feature_group_count=1, preferred_element_type=jnp.int32)
        return (acc.astype(jnp.float32)
                * (s_act * sw.reshape(1, 1, 1, cout))).astype(lhs.dtype)
    # per-example activation scale (amax over H,W,C) -> batch-invariant
    ql, sl = _quantize_rows(
        lhs, reduce_axes=(1, 2, 3) if spec.per_row else (0, 1, 2, 3))
    qr, sr = _quantize_per_channel(rhs, channel_axis=3)  # (1,1,1,O)
    acc = jax.lax.conv_general_dilated(
        ql, qr, window_strides, padding, lhs_dilation=lhs_dilation,
        rhs_dilation=rhs_dilation, dimension_numbers=dimension_numbers,
        feature_group_count=1, preferred_element_type=jnp.int32)
    return (acc.astype(jnp.float32) * (sl * sr.reshape(1, 1, 1, cout))
            ).astype(lhs.dtype)
