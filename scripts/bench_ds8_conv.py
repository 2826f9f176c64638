"""ds8-tail conv attempt (PERF.md §5): can an explicit im2col matmul beat
XLA's conv schedule at 8²×1280?

The round-3 attribution measured the ds8 conv3x3 at 52 µs marginal vs a
19 µs roofline (37% util) — the worst conv utilization in the UNet. The
hypothesis: at 8² the conv's implicit GEMM has M = B·H·W = 128 rows
(one MXU tile), and XLA's conv emitter spends its time on halo handling
rather than the matmul. Candidate formulations, all computing the same
3×3 SAME conv:

    lax        jax.lax.conv_general_dilated (the production path)
    im2col     pad once, concat the 9 shifted HW views on the channel
               axis -> one (B·H·W, 9C) x (9C, C) matmul
    dot9       9 separate (B·H·W, C) x (C, C) matmuls on the shifted
               views, summed (no 9C concat materialization)

Each is timed with the marginal-cost chained method (k=8 vs k=1 body
applications; the (t8-t1)/7 difference cancels the ~0.6 ms chain floor
and the tunnel round trip). Equality is asserted to 1e-2 (bf16).

Usage: python scripts/bench_ds8_conv.py [--geoms ds8 ds4]
One JSON line per (geometry, formulation).
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pbe_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    p = argparse.ArgumentParser()
    p.add_argument("--geoms", nargs="*", default=["ds8", "ds4"])
    p.add_argument("--batch", type=int, default=2)
    # chain lengths sized so (t_hi - t_lo) >> tunnel jitter (the round-4
    # 1-vs-8 defaults produced a ~0.4 ms delta at these <150 µs bodies —
    # below the noise floor; negative marginals and util 7.6e10 followed,
    # benchmarks/ds8_conv_r4.jsonl / VERDICT r4 weak #8)
    p.add_argument("--repeats", type=int, default=7)
    p.add_argument("--lo", type=int, default=64)
    p.add_argument("--hi", type=int, default=512)
    p.add_argument("--peak_tflops", type=float, default=197.0)
    opt = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    GEOMS = {"ds8": (8, 1280), "ds4": (16, 1280)}

    def conv_lax(x, w):
        return jax.lax.conv_general_dilated(
            x, w, window_strides=(1, 1), padding=((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    def shifted_views(x):
        # 3x3 SAME taps: pad then take the 9 HW-offset views
        b, h, w, c = x.shape
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        return [xp[:, dy:dy + h, dx:dx + w, :]
                for dy in range(3) for dx in range(3)]

    def conv_im2col(x, w):
        b, h, wd, c = x.shape
        cols = jnp.concatenate(shifted_views(x), axis=-1)  # (B,H,W,9C)
        mat = cols.reshape(b * h * wd, 9 * c)
        out = mat @ w.reshape(9 * c, -1)
        return out.reshape(b, h, wd, -1)

    def conv_dot9(x, w):
        b, h, wd, c = x.shape
        views = shifted_views(x)
        wmats = w.reshape(9, c, -1)
        acc = None
        for i, v in enumerate(views):
            o = v.reshape(b * h * wd, c) @ wmats[i]
            acc = o if acc is None else acc + o
        return acc.reshape(b, h, wd, -1)

    IMPLS = {"lax": conv_lax, "im2col": conv_im2col, "dot9": conv_dot9}

    def chained(fn, w, k):
        @jax.jit
        def run(x):
            def body(_, carry):
                return fn(carry, w).astype(carry.dtype)
            return jax.lax.fori_loop(0, k, body, x)
        return run

    for geom in opt.geoms:
        side, c = GEOMS[geom]
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (opt.batch, side, side, c), jnp.bfloat16)
        w = (jax.random.normal(key, (3, 3, c, c), jnp.bfloat16)
             / np.sqrt(9 * c).astype(np.float32)).astype(jnp.bfloat16)

        want = np.asarray(conv_lax(x, w), np.float32)
        flops = 2 * opt.batch * side * side * 9 * c * c
        ideal_us = flops / (opt.peak_tflops * 1e12) * 1e6

        for name, fn in IMPLS.items():
            got = np.asarray(fn(x, w), np.float32)
            err = float(np.abs(got - want).max() / (np.abs(want).max() + 1e-9))
            assert err < 1e-2, (geom, name, err)

            times = {}
            for k in (opt.lo, opt.hi):
                run = chained(fn, w, k)
                float(jnp.mean(run(x)))  # compile + settle
                ts = []
                for _ in range(opt.repeats):
                    t0 = time.perf_counter()
                    float(jnp.mean(run(x)))
                    ts.append(time.perf_counter() - t0)
                times[k] = float(np.median(ts))
            delta = times[opt.hi] - times[opt.lo]
            marg_us = delta / (opt.hi - opt.lo) * 1e6
            row = {
                "geom": geom, "impl": name,
                "marginal_us": round(marg_us, 1),
                "ideal_us": round(ideal_us, 1),
                "util": round(ideal_us / max(marg_us, 1e-9), 3),
                "rel_err_vs_lax": round(err, 6),
                "delta_ms": round(delta * 1e3, 2),
            }
            if delta < 5e-3:
                row["warning"] = "delta below 5 ms — unreliable; raise --hi"
            print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
