"""Variant hunt for the pathological [B,32,32,256]->[256] 3x3 SAME conv
(14% MXU vs 98% for the same conv at 16x16 -- see conv_probe.py results)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

PEAK_TF = 197e12


def chain_bench(op, x, reps_lo=4, reps_hi=20, outer=3):
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

    return (time_one(make(reps_hi)) - time_one(make(reps_lo))) / (reps_hi - reps_lo)


def main():
    dt = jnp.bfloat16
    n, h, wd, c = 256, 32, 32, 256
    key = jax.random.key(0)
    x = jax.random.normal(key, (n, h, wd, c), dt)
    w = jax.random.normal(jax.random.key(2), (3, 3, c, c), dt) * 0.02
    flops = 2 * n * h * wd * 9 * c * c

    def report(name, t):
        print(f"{name:28s} {t*1e3:8.3f} ms  ({flops/t/PEAK_TF*100:5.1f}%)")

    def conv_same(x):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def conv_valid_prepad(x):
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        return jax.lax.conv_general_dilated(
            xp, w, (1, 1), [(0, 0), (0, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def conv_tiled(x):
        # overlap-save: pad to 34x34, 4 overlapping 18x18 tiles -> batch,
        # VALID conv to 16x16 tiles, reassemble.
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        tiles = jnp.stack([
            xp[:, 0:18, 0:18], xp[:, 0:18, 16:34],
            xp[:, 16:34, 0:18], xp[:, 16:34, 16:34]], axis=1
        ).reshape(n * 4, 18, 18, c)
        y = jax.lax.conv_general_dilated(
            tiles, w, (1, 1), [(0, 0), (0, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = y.reshape(n, 2, 2, 16, 16, c).transpose(0, 1, 3, 2, 4, 5)
        return y.reshape(n, 32, 32, c)

    def conv_splitH(x):
        # split along H only: two [B,18,32,C] VALID convs (halo rows)
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))  # [B,34,34,C]
        tiles = jnp.concatenate([xp[:, 0:18], xp[:, 16:34]], axis=0)
        y = jax.lax.conv_general_dilated(
            tiles, w, (1, 1), [(0, 0), (0, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))  # [2B,16,32,C]
        return jnp.concatenate([y[:n], y[n:]], axis=1)

    report("SAME 32x32 (baseline)", chain_bench(conv_same, x))
    report("VALID prepad 34x34", chain_bench(conv_valid_prepad, x))
    report("overlap-save 4x 18x18", chain_bench(conv_tiled, x))
    report("split-H 2x 18x32", chain_bench(conv_splitH, x))

    # surrogate shapes for reference
    x16 = jax.random.normal(key, (n * 4, 16, 16, c), dt)

    def conv16(x):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    t = chain_bench(conv16, x16)
    report("surrogate 1024x16x16 SAME", t)

    xf = x.astype(jnp.float32)
    wf = w.astype(jnp.float32)

    def conv_f32(x):
        return jax.lax.conv_general_dilated(
            x, wf, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    report("SAME 32x32 f32", chain_bench(conv_f32, xf))

    x512 = jax.random.normal(key, (512, h, wd, c), dt)
    t = chain_bench(conv_same, x512)
    print(f"{'SAME 32x32 batch512':28s} {t*1e3:8.3f} ms  "
          f"({2*flops/t/PEAK_TF*100:5.1f}%)")


if __name__ == "__main__":
    main()
