"""A/B probe: streamed (software-pipelined) PNG saving vs serial save-after.

Measures the end-to-end wall time of `sampling.generate` + PNG output for a
pixel tier two ways on the real chip:

  A (reference pattern): generate() fully, then write every PNG serially --
    the reference's structure (diff-solvers-main/sample.py:294-316 computes,
    fetches, saves per batch with a barrier in between; no overlap).
  B (round 5): generate(batch_callback=...) -- the batch loop dispatches
    batch i+1 before fetching batch i, so host-side uint8 convert + PNG
    encode + write overlap device compute.

Both arms run the same compiled function on the same seeds; outputs are
bit-identical (asserted). Timing: each arm runs once for warm-up/compile,
then `reps` timed runs; report the median. One chip, run uncontended.

Usage: python -u scripts/stream_save_probe.py [nfe] [n_images] [reps]
"""

import shutil
import sys
import tempfile
import time

import numpy as np

import jax

sys.path.insert(0, ".")

from diff_sampler_tpu.models.factory import create_model  # noqa: E402
from diff_sampler_tpu.models.precond import bind  # noqa: E402
from diff_sampler_tpu.sampling import SolverConfig, generate, to_uint8  # noqa: E402
from diff_sampler_tpu.utils.image import save_images  # noqa: E402


def main():
    nfe = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    num_steps = nfe + 1  # ipndm: NFE = num_steps - 1
    module, params, _ = create_model("cifar10", "random")
    den = bind(module, params)
    shape = (32, 32, 3)
    cfg = SolverConfig(solver="ipndm", num_steps=num_steps)
    seeds = list(range(n))
    batch = 128  # 4 batches per run on one chip: pipeline has work to hide
    print(f"cifar10 random, ipndm NFE={nfe}, n={n}, batch={batch}, "
          f"device={jax.devices()[0].device_kind}")

    def arm_a(outdir):
        imgs = generate(den, seeds, shape, cfg, max_batch_size=batch)
        save_images(to_uint8(imgs), seeds, outdir, subdirs=False)
        return imgs

    def arm_b(outdir):
        return generate(
            den, seeds, shape, cfg, max_batch_size=batch,
            batch_callback=lambda s, x: save_images(
                to_uint8(x), seeds[s : s + len(x)], outdir, subdirs=False))

    results = {}
    baseline = None
    for name, fn in (("serial_after", arm_a), ("streamed", arm_b)):
        d = tempfile.mkdtemp()
        out = fn(d)  # warm-up (compile shared across arms after first)
        if baseline is None:
            baseline = out
        else:
            np.testing.assert_array_equal(out, baseline)
        shutil.rmtree(d)
        times = []
        for _ in range(reps):
            d = tempfile.mkdtemp()
            t0 = time.perf_counter()
            fn(d)
            times.append(time.perf_counter() - t0)
            shutil.rmtree(d)
        results[name] = float(np.median(times))
        print(f"{name}: median {results[name]:.3f}s over {reps} "
              f"(all: {[round(t, 3) for t in times]})")
    a, b = results["serial_after"], results["streamed"]
    print(f"overlap win: {a / b:.3f}x ({(1 - b / a) * 100:.1f}% wall removed); "
          f"imgs/s end-to-end {n / a:.1f} -> {n / b:.1f}")


if __name__ == "__main__":
    main()
