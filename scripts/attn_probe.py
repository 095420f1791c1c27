"""Isolated attention timing at the ImageNet-64 ADM tier's exact shapes.

adm_probe.py located 43% of the 296M-param denoiser eval in attention
(141.7 -> 80.2 ms/eval with attn_resolutions=()); this probes WHERE inside
the attention path that time goes, per shape, with single-op compiles
(seconds, not the ~5 min a 296M-model jit costs over the tunnel):

  flash      -- production sdpa path (transpose + pad-d-to-128 + kernel)
  kernel     -- flash_attention alone on pre-flattened [B*H, T, d] inputs
                (isolates the sdpa transpose/reshape overhead)
  kernel128  -- kernel on d already 128 (isolates the d-pad copies)
  einsum     -- _reference_sdpa on pre-flattened inputs (f32 logits in HBM)

Shapes: (BH, T, d) per attention level of DhariwalUNet imagenet64 at
batch 64: 32x32 C=384 H=6 -> (384, 1024, 64); 16x16 C=576 H=9 ->
(576, 256, 64); 8x8 C=768 H=12 -> (768, 64, 64).
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
    """Delta-timed chained eval (BENCH_NOTES timing rule): the first arg is
    replaced by the previous output so reps cannot be elided or overlapped,
    and a SCALAR D2H closes each run -- on the axon tunnel,
    block_until_ready alone under-reports small ops (measured: 0.02 ms
    "per call" for a 0.5 ms attention, >100% apparent MXU); the fetch of a
    value data-dependent on the whole chain is what actually fences."""
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
    p.add_argument("--shapes", nargs="*", default=["384x1024x6", "576x256x9",
                                                   "768x64x12"],
                   help="BHxTxH triplets (BH = batch*heads, H = heads)")
    p.add_argument("--variants", nargs="*",
                   default=["flash", "kernel", "kernel128", "einsum"])
    p.add_argument("--d", type=int, default=64,
                   help="head dim (32 for the LDM tier's d_head)")
    args = p.parse_args()
    print("devices:", jax.devices())

    from diff_sampler_tpu.ops import pallas_attention as PA
    from diff_sampler_tpu.ops.pallas_attention import (_reference_sdpa,
                                                       flash_attention,
                                                       flash_attention_mh,
                                                       sdpa)

    d = args.d
    for spec in args.shapes:
        bh, t, h = (int(s) for s in spec.split("x"))
        b = bh // h
        rng = np.random.RandomState(0)
        flat = [jnp.asarray(rng.randn(bh, t, d) * 0.1, jnp.bfloat16)
                for _ in range(3)]
        flat128 = [jnp.asarray(rng.randn(bh, t, 128) * 0.1, jnp.bfloat16)
                   for _ in range(3)]
        nhwc = [jnp.asarray(rng.randn(b, t, h, d) * 0.1, jnp.bfloat16)
                for _ in range(3)]
        scale = 1.0 / np.sqrt(d)
        flops = 2 * 2 * bh * t * t * d  # qk + pv
        for variant in args.variants:
            if variant == "flash":
                fn = lambda q, k, v: sdpa(q, k, v, scale)
                a = nhwc
                fl = flops
            elif variant == "kernel":
                fn = lambda q, k, v: flash_attention(q, k, v, float(scale),
                                                     False)
                a = flat
                fl = flops
            elif variant == "kernel128":
                # output stays [BH, T, 128] so the chained-timing rep can
                # feed it back in as q
                fn = lambda q, k, v: flash_attention(
                    q, k, v, float(1.0 / np.sqrt(128)), False)
                a = flat128
                fl = flops * 2
            elif variant == "einsum":
                fn = lambda q, k, v: _reference_sdpa(q, k, v, scale)
                a = flat
                fl = flops
            elif variant == "mh":
                # multi-head kernel on the native layout (no transposes,
                # no d-pad; per-head d=64 MXU slices)
                fn = lambda q, k, v: flash_attention_mh(q, k, v, float(scale))
                a = nhwc
                fl = flops
            elif variant in ("mh_packed", "mh_unpacked"):
                # A/B the small-d head-packed kernel (_PACK_SMALL_D note in
                # pallas_attention.py) against the per-head loop, each under
                # its own verified VMEM plan (the production dispatch path;
                # raw default blocks OOM at e.g. width 448 H=14)
                want = variant == "mh_packed"
                PA._PACK_SMALL_D = want
                try:
                    plan = PA._mh_plan_verified(t, h * d, h, 2)
                finally:
                    PA._PACK_SMALL_D = True
                if plan is None:
                    print(f"{spec:>14s} {variant:10s} no viable plan")
                    continue

                def fn(q, k, v, want=want, plan=plan):
                    PA._PACK_SMALL_D = want
                    try:
                        return flash_attention_mh(q, k, v, float(scale),
                                                  False, plan[0], plan[1])
                    finally:
                        PA._PACK_SMALL_D = True
                print(f"{spec:>14s} {variant:10s} plan={plan}")
                a = nhwc
                fl = flops
            elif variant.startswith("mh_"):
                # explicit (bq, bk) plan, e.g. mh_1024x256 -- sweeps the
                # planner's block space (the compile-probe planner makes
                # trying big plans safe: a bad one fails at compile, here)
                bq, bk = (int(s) for s in variant[3:].split("x"))
                fn = lambda q, k, v: flash_attention_mh(
                    q, k, v, float(scale), False, bq, bk)
                a = nhwc
                fl = flops
            elif variant == "native_einsum":
                # small-T sdpa fallback: batched einsum on the native layout
                def fn(q, k, v):
                    logits = scale * jnp.einsum(
                        "bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32)
                    w = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
                    return jnp.einsum("bhqk,bkhd->bqhd", w, v)
                a = nhwc
                fl = flops
            else:
                raise SystemExit(f"unknown variant {variant}")
            try:
                ms = chained_ms(fn, a)
            except Exception as e:  # keep probing other variants
                print(f"{spec:>14s} {variant:10s} FAILED: {e}")
                continue
            print(f"{spec:>14s} {variant:10s} {ms:8.3f} ms  "
                  f"{100 * fl / (ms * 1e-3) / 197e12:5.1f}% MXU")


if __name__ == "__main__":
    main()
