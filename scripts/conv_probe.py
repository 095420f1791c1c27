"""Chained microbenchmarks for the hot ops of the CIFAR SongUNet.

Every variant is timed by CHAINING: a scalar of the output is folded back
into the next input, forcing sequential execution (BENCH_NOTES.md gotcha --
un-chained dispatch loops on the axon tunnel report dispatch time, not
device time).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

PEAK_TF = 197e12


def chain_bench(op, x, reps_lo=4, reps_hi=36, outer=3):
    """Per-op device time via in-graph chaining: run the op `reps` times
    inside ONE jit (each iteration data-dependent on the last) and report
    (t(reps_hi) - t(reps_lo)) / (reps_hi - reps_lo), cancelling the axon
    tunnel's per-dispatch overhead (~3 ms) and any fixed reduction cost."""
    same_shape = jax.eval_shape(op, x).shape == x.shape

    def make(reps):
        @jax.jit
        def run(x):
            def body(_i, x):
                y = op(x)
                if same_shape:
                    return x + y.astype(x.dtype) * 0.1
                return x + jnp.mean(y.astype(jnp.float32)).astype(x.dtype) * 1e-9
            return jax.lax.fori_loop(0, reps, body, x)
        return run

    def time_one(run):
        y = run(x)
        y.block_until_ready()
        best = float("inf")
        for _ in range(outer):
            t0 = time.perf_counter()
            run(x).block_until_ready()
            best = min(best, time.perf_counter() - t0)
        return best

    t_lo = time_one(make(reps_lo))
    t_hi = time_one(make(reps_hi))
    return (t_hi - t_lo) / (reps_hi - reps_lo)


def conv_xla(w):
    def op(x):
        return jax.lax.conv_general_dilated(
            x, w, window_strides=(1, 1), padding=[(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return op


def conv_shifts(w):
    def op(x):
        n, h, wd, cin = x.shape
        cout = w.shape[-1]
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        acc = jnp.zeros((n * h * wd, cout), jnp.float32)
        for dy in range(3):
            for dx in range(3):
                sl = xp[:, dy:dy + h, dx:dx + wd, :].reshape(-1, cin)
                acc = acc + jnp.dot(sl, w[dy, dx],
                                    preferred_element_type=jnp.float32)
        return acc.reshape(n, h, wd, cout).astype(x.dtype)
    return op


def main():
    dt = jnp.bfloat16
    print("== 3x3 convs (chained) ==")
    for (n, h, wd, cin, cout) in [
            (256, 32, 32, 256, 256),
            (256, 16, 16, 256, 256),
            (256, 8, 8, 256, 256),
            (256, 32, 32, 128, 256)]:
        x = jax.random.normal(jax.random.key(0), (n, h, wd, cin), dt)
        w = jax.random.normal(jax.random.key(2), (3, 3, cin, cout), dt) * 0.01
        flops = 2 * n * h * wd * 9 * cin * cout
        t1 = chain_bench(conv_xla(w), x)
        t2 = chain_bench(conv_shifts(w), x)
        print(f"[{n}x{h}x{wd}x{cin}->{cout}] xla {t1*1e3:7.3f} ms "
              f"({flops/t1/PEAK_TF*100:5.1f}%)   9shift {t2*1e3:7.3f} ms "
              f"({flops/t2/PEAK_TF*100:5.1f}%)")

    print("== GroupNorm+SiLU (chained) ==")
    from diff_sampler_tpu.ops.pallas_groupnorm import groupnorm_silu
    for (n, h, wd, c) in [(256, 32, 32, 256), (256, 16, 16, 256)]:
        x = jax.random.normal(jax.random.key(1), (n, h, wd, c), dt)
        s = jnp.ones((c,))
        b = jnp.zeros((c,))
        t1 = chain_bench(lambda x: groupnorm_silu(x, s, b, groups=32,
                                                  apply_silu=True), x)
        gb = 2 * n * h * wd * c * 2 / 1e9  # read+write bf16
        print(f"[gn+silu {n}x{h}x{wd}x{c}] {t1*1e3:7.3f} ms  "
              f"({gb/t1:6.1f} GB/s eff)")

    print("== resample (chained) ==")
    for (n, h, wd, c) in [(256, 32, 32, 256), (256, 16, 16, 256)]:
        x = jax.random.normal(jax.random.key(1), (n, h, wd, c), dt)
        kern = jnp.full((2, 2, 1, c), 0.25, dt)

        def dw_down(x):
            return jax.lax.conv_general_dilated(
                x, kern, window_strides=(2, 2), padding=[(0, 0), (0, 0)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=c)

        def rs_down(x):
            nn, hh, ww, cc = x.shape
            return (x.astype(jnp.float32).reshape(nn, hh // 2, 2, ww // 2, 2, cc)
                    .mean(axis=(2, 4)).astype(x.dtype))

        t1 = chain_bench(dw_down, x)
        t2 = chain_bench(rs_down, x)
        print(f"[down {n}x{h}x{wd}x{c}] depthwise {t1*1e3:7.3f} ms   "
              f"reshape {t2*1e3:7.3f} ms")

        ku = jnp.ones((2, 2, 1, c), dt)

        def dw_up(x):
            return jax.lax.conv_general_dilated(
                x, ku, window_strides=(1, 1), padding=[(1, 1), (1, 1)],
                lhs_dilation=(2, 2),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=c)

        def rs_up(x):
            nn, hh, ww, cc = x.shape
            y = jnp.broadcast_to(x[:, :, None, :, None, :],
                                 (nn, hh, 2, ww, 2, cc))
            return y.reshape(nn, 2 * hh, 2 * ww, cc)

        t1 = chain_bench(dw_up, x)
        t2 = chain_bench(rs_up, x)
        print(f"[up   {n}x{h}x{wd}x{c}] depthwise {t1*1e3:7.3f} ms   "
              f"reshape {t2*1e3:7.3f} ms")


if __name__ == "__main__":
    main()
