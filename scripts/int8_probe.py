"""Does v5e int8 actually run at 2x the bf16 MXU rate through XLA?

The CIFAR headline sits at 74% model MXU against a measured 78% isolated
bf16 conv ceiling (BENCH_NOTES) -- the only way materially past it is the
int8 MXU path (v5e: 394 int8 TOPS vs 197 bf16 TFLOP/s).  Before building a
quantized-inference tier, verify XLA emits real int8 MXU ops:

  dot_bf16    -- [M,K]x[K,N] bf16, f32 accum (baseline)
  dot_int8    -- same shape int8, int32 accum
  conv_bf16   -- 3x3 NHWC conv at the SongUNet hot shape
  conv_int8   -- same conv with int8 operands, int32 accum
  conv_qdq    -- full dynamic-quant round trip (abs-max activation scale,
                 per-channel int8 weights, dequant) -- what a production
                 layer would actually pay

Timing: chained delta-rep (BENCH_NOTES rule) with a scalar D2H fence.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def chained_ms(fn, args, lo=8, hi=24):
    jfn = jax.jit(fn)
    fence = jax.jit(lambda z: jnp.sum(z.astype(jnp.float32)))
    y = jfn(*args)
    float(fence(y))

    def run(n):
        t0 = time.perf_counter()
        z = args[0]
        for _ in range(n):
            z = jfn(z, *args[1:])
        float(fence(z))
        return time.perf_counter() - t0

    run(4)
    deltas = []
    for _ in range(3):
        deltas.append((run(hi) - run(lo)) / (hi - lo))
    return 1e3 * float(np.median(deltas))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--m", type=int, default=8192)
    p.add_argument("--k", type=int, default=2304)   # 3*3*256
    p.add_argument("--n", type=int, default=2304)  # == k so chained y[:, :k] feeds back as x
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--res", type=int, default=32)
    p.add_argument("--c", type=int, default=256)
    p.add_argument("--variants", nargs="*",
                   default=["dot_bf16", "dot_int8", "conv_bf16", "conv_int8",
                            "conv_qdq"])
    args = p.parse_args()
    # the dot variants chain y[:, :k] back as x, which is shape-correct
    # feedback only when n == k (advisor finding, round 3)
    if args.n != args.k:
        p.error(f"--n ({args.n}) must equal --k ({args.k}): the chained "
                "dot feeds y[:, :k] back as the next x")
    print("devices:", jax.devices())

    rng = np.random.RandomState(0)
    m, k, n = args.m, args.k, args.n
    b, r, c = args.batch, args.res, args.c
    dn = jax.lax.conv_dimension_numbers((b, r, r, c), (3, 3, c, c),
                                        ("NHWC", "HWIO", "NHWC"))

    for variant in args.variants:
        if variant == "dot_bf16":
            a = [jnp.asarray(rng.randn(m, k) * 0.1, jnp.bfloat16),
                 jnp.asarray(rng.randn(k, n) * 0.1, jnp.bfloat16)]

            def fn(x, w):
                y = jax.lax.dot(x, w, preferred_element_type=jnp.float32)
                return y[:, :k].astype(jnp.bfloat16)
            fl = 2 * m * k * n
            peak = 197e12
        elif variant == "dot_int8":
            a = [jnp.asarray(rng.randint(-127, 127, (m, k)), jnp.int8),
                 jnp.asarray(rng.randint(-127, 127, (k, n)), jnp.int8)]

            def fn(x, w):
                y = jax.lax.dot(x, w, preferred_element_type=jnp.int32)
                out = jnp.clip(y[:, :k] >> 8, -127, 127).astype(jnp.int8)
                # xor a full-reduction scalar into the feedback so XLA
                # cannot elide the dot (round-3 run measured 1225% of
                # peak = the shift/clip chain alone was not a strong
                # enough data dependency)
                return out ^ (jnp.sum(y) & 1).astype(jnp.int8)
            fl = 2 * m * k * n
            peak = 394e12
        elif variant == "conv_bf16":
            a = [jnp.asarray(rng.randn(b, r, r, c) * 0.1, jnp.bfloat16),
                 jnp.asarray(rng.randn(3, 3, c, c) * 0.1, jnp.bfloat16)]

            def fn(x, w):
                y = jax.lax.conv_general_dilated(
                    x, w, (1, 1), "SAME", dimension_numbers=dn,
                    preferred_element_type=jnp.float32)
                return y.astype(jnp.bfloat16)
            fl = 2 * b * r * r * 9 * c * c
            peak = 197e12
        elif variant == "conv_int8":
            a = [jnp.asarray(rng.randint(-127, 127, (b, r, r, c)), jnp.int8),
                 jnp.asarray(rng.randint(-127, 127, (3, 3, c, c)), jnp.int8)]

            def fn(x, w):
                y = jax.lax.conv_general_dilated(
                    x, w, (1, 1), "SAME", dimension_numbers=dn,
                    preferred_element_type=jnp.int32)
                return jnp.clip(y >> 8, -127, 127).astype(jnp.int8)
            fl = 2 * b * r * r * 9 * c * c
            peak = 394e12
        elif variant == "conv_qdq":
            a = [jnp.asarray(rng.randn(b, r, r, c) * 0.1, jnp.bfloat16),
                 jnp.asarray(rng.randint(-127, 127, (3, 3, c, c)), jnp.int8),
                 jnp.asarray(np.abs(rng.randn(c)) * 0.01, jnp.float32)]

            def fn(x, wq, wscale):
                xs = jnp.max(jnp.abs(x.astype(jnp.float32))) / 127.0
                xq = jnp.clip(jnp.round(x.astype(jnp.float32) / xs),
                              -127, 127).astype(jnp.int8)
                y = jax.lax.conv_general_dilated(
                    xq, wq, (1, 1), "SAME", dimension_numbers=dn,
                    preferred_element_type=jnp.int32)
                return (y.astype(jnp.float32) * (xs * wscale)).astype(
                    jnp.bfloat16)
            fl = 2 * b * r * r * 9 * c * c
            peak = 394e12
        else:
            raise SystemExit(f"unknown variant {variant}")
        try:
            ms = chained_ms(fn, a)
        except Exception as e:
            print(f"{variant:10s} FAILED: {type(e).__name__}: {e}")
            continue
        print(f"{variant:10s} {ms:8.3f} ms  "
              f"{100 * fl / (ms * 1e-3) / peak:5.1f}% of its peak  "
              f"({fl / (ms * 1e-3) / 1e12:6.1f} Tops/s)")


if __name__ == "__main__":
    main()
