"""Isolated A/B of the three mh-backward paths at the SD T=4096 shape
(B=2 microbatch, T=4096, H=8, d=40 -- the 860M tier's 64x64 level), with
block-size sweep for the streamed kernels (VERDICT r4 item 7 follow-up).

Chained delta-rep timing (fori-loop chains in-graph, scalar fence),
uncontended chip.
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from diff_sampler_tpu.ops import pallas_attention as PA

B, T, H, D = 2, 4096, 8, 40
S = float(1.0 / np.sqrt(D))


def chained(fn, *args, reps=(2, 8)):
    fn = jax.jit(fn)
    outs = fn(*args)
    float(jnp.asarray(jax.tree.leaves(outs)[0]).ravel()[0].astype(jnp.float32))

    def run(n):
        t0 = time.perf_counter()
        x = args
        o = None
        for _ in range(n):
            o = fn(*x)
        float(jnp.asarray(jax.tree.leaves(o)[0]).ravel()[0].astype(jnp.float32))
        return time.perf_counter() - t0

    ds = []
    for _ in range(3):
        ds.append((run(reps[1]) - run(reps[0])) / (reps[1] - reps[0]))
    ds.sort()
    return 1e3 * ds[1]


def main():
    rng = np.random.RandomState(0)
    q, k, v = (jnp.asarray(rng.randn(B, T, H, D) * 0.3, jnp.bfloat16)
               for _ in range(3))
    cot = jnp.asarray(rng.randn(B, T, H, D) * 0.3, jnp.bfloat16)

    def bwd(q_, k_, v_):
        def loss(a, b, c):
            return (PA.flash_attention_mh(a, b, c, S) * cot).sum()
        return jax.grad(loss, argnums=(0, 1, 2))(q_, k_, v_)

    # flat fallback (force by disabling both mh plans)
    saved_res, saved_str = PA._mh_bwd_plan, PA._mh_bwd_stream_plan
    PA._mh_bwd_plan = lambda *a, **kw: None
    PA._mh_bwd_stream_plan = lambda *a, **kw: None
    try:
        ms = chained(bwd, q, k, v)
        print(f"flat (4 transposes)     {ms:8.2f} ms")
    finally:
        PA._mh_bwd_plan, PA._mh_bwd_stream_plan = saved_res, saved_str

    # streamed at several block plans
    for bq, bk in [(256, 256), (256, 1024), (512, 512), (128, 2048)]:
        PA._mh_bwd_plan = lambda *a, **kw: None
        PA._mh_bwd_stream_plan = (
            lambda *a, _bq=bq, _bk=bk, **kw: (_bq, _bk))
        try:
            ms = chained(bwd, q, k, v)
            print(f"stream bq={bq:4d} bk={bk:4d} {ms:8.2f} ms", flush=True)
        except Exception as e:
            print(f"stream bq={bq:4d} bk={bk:4d} FAILED: {type(e).__name__} "
                  f"{str(e)[:80]}", flush=True)
        finally:
            PA._mh_bwd_plan, PA._mh_bwd_stream_plan = saved_res, saved_str


if __name__ == "__main__":
    main()
