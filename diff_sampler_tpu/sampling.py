"""High-level generation API: the TPU-native equivalent of the reference's
`sample.py` main loop (`diff-solvers-main/sample.py:125-320`).

Given a bound denoiser, a solver config, and a list of seeds, produces images
data-parallel over a device mesh with the per-seed determinism contract
(image i is a pure function of seed i at any batch/device count).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from .ops import get_schedule
from .parallel import mesh as pm
from .solvers import count_nfe, get_sampler
from .utils.rng import stacked_randn

__all__ = ["SolverConfig", "build_sample_fn", "generate", "to_uint8"]


@dataclasses.dataclass(frozen=True)
class SolverConfig:
    """Mirrors the reference's SOLVER_FLAGS / SCHEDULE_FLAGS / ADDITIONAL_FLAGS
    (`sample.py:125-162`)."""

    solver: str = "heun"
    num_steps: int = 6
    schedule_type: str = "polynomial"
    schedule_rho: float = 7.0
    afs: bool = False
    denoise_to_zero: bool = False
    max_order: Optional[int] = None  # default: 4 (lms family) / 3 (dpmpp, unipc)
    predict_x0: bool = True
    lower_order_final: bool = True
    variant: str = "bh2"
    deis_mode: str = "tab"
    r: float = 0.5
    t_steps: Optional[Tuple[float, ...]] = None  # explicit sigma schedule
    dp_list: Optional[Tuple[int, ...]] = None  # GITS schedule sub-selection
    # --sigma_min/--sigma_max (sample.py:153-154); None = the model's own
    # range.  Intentional divergence: when set, these OVERRIDE the model
    # range -- the reference accepts the flags but silently overwrites them
    # with net attrs (sample.py:196-197), making them no-ops for every model
    # that defines a range (i.e. all of them).  Documented in MIGRATION.md.
    sigma_min: Optional[float] = None
    sigma_max: Optional[float] = None

    def resolve_t_steps(self, sigma_min: float, sigma_max: float,
                        sigma_fn=None, sigma_inv_fn=None) -> np.ndarray:
        if self.t_steps is not None:
            return np.asarray(self.t_steps, dtype=np.float64)
        sigma_min = self.sigma_min if self.sigma_min is not None else sigma_min
        sigma_max = self.sigma_max if self.sigma_max is not None else sigma_max
        return get_schedule(
            self.num_steps, sigma_min, sigma_max, self.schedule_type,
            self.schedule_rho, sigma_fn=sigma_fn, sigma_inv_fn=sigma_inv_fn,
            dp_list=self.dp_list)

    def sampler_kwargs(self) -> dict:
        kw = dict(afs=self.afs, denoise_to_zero=self.denoise_to_zero,
                  predict_x0=self.predict_x0,
                  lower_order_final=self.lower_order_final,
                  variant=self.variant, deis_mode=self.deis_mode, r=self.r)
        if self.max_order is not None:
            kw["max_order"] = self.max_order
        return kw

    def nfe(self, cfg_doubled: bool = False) -> int:
        n = len(self.t_steps) if self.t_steps is not None else self.num_steps
        n = len(self.dp_list) if self.dp_list is not None else n
        return count_nfe(self.solver, n, self.afs, self.denoise_to_zero, cfg_doubled)


def build_sample_fn(denoise, cfg: SolverConfig, *, sigma_fn=None, sigma_inv_fn=None,
                    return_inters: bool = False, dtype=jnp.float32):
    """Build `latents -> samples` for a bound denoiser (not yet jitted)."""
    t_steps = cfg.resolve_t_steps(denoise.sigma_min, denoise.sigma_max,
                                  sigma_fn=sigma_fn, sigma_inv_fn=sigma_inv_fn)
    sampler = get_sampler(cfg.solver)
    kw = cfg.sampler_kwargs()

    def fn(latents):
        out = sampler(denoise, latents, t_steps, return_inters=return_inters,
                      dtype=dtype, **kw)
        return out if return_inters else out.x

    return fn


def generate(denoise, seeds: Sequence[int], sample_shape: Tuple[int, ...],
             cfg: SolverConfig, *, mesh=None, max_batch_size: int = 64,
             sigma_fn=None, sigma_inv_fn=None, dtype=jnp.float32,
             label_dim: int = 0, label_kind: str = "onehot",
             denoise_with_labels=None, class_idx=None,
             per_seed_cond: Optional[np.ndarray] = None,
             return_inters: bool = False,
             jit_params=None, bind_params=None,
             batch_callback=None) -> np.ndarray:
    """Generate len(seeds) samples, data-parallel over the mesh.

    sample_shape: per-sample shape, e.g. (32, 32, 3) NHWC.

    Conditional models: pass `denoise_with_labels(x, t, labels)` plus
    label_dim; per-seed random class labels are drawn deterministically
    (seed i -> same class at any batch split, mirroring
    `sample.py:276-281`), one-hot for EDM or integer for ADM
    (label_kind='int').  `class_idx` pins a single class.

    Returns a float32 numpy array [len(seeds), *sample_shape]; with
    `return_inters=True`, [num_points, len(seeds), *sample_shape] — the full
    trajectory including x_T and the final sample (`--return_inters`,
    sample.py:140).

    jit_params/bind_params: route a big (274-860M) frozen param tree as a
    jit ARGUMENT instead of a closure constant — closing over it embeds it
    into the serialized HLO, which the axon remote-compile service rejects
    at >1 GB (BENCH_NOTES round 4). `bind_params(p)` is called with the
    traced tree before the denoiser runs (e.g. assigning
    LatentDiffusion.unet_params, whose apply_model reads it late-bound).

    batch_callback(start, images_np): called once per batch as its result
    lands on host (float32, padding stripped, seed order). The batch loop
    is software-pipelined — batch i+1 is DISPATCHED before batch i is
    fetched — so the device computes the next batch while the host runs
    the callback (e.g. streaming PNG writes, cli/sample). The reference
    serializes compute → D2H → save per batch (sample.py:294-316); jax's
    async dispatch makes the overlap free. Results are bit-identical
    with or without a callback (same compiled fn, same inputs).
    """
    if mesh is None:
        mesh = pm.get_mesh()
    # max_batch_size is the PER-DEVICE memory cap; the batch only splits over
    # the 'data' axis, so a 2-D (data, model) tensor-parallel mesh must size
    # chunks by the data extent, not the device count (each model-axis device
    # holds the full data-row batch).
    n_dev = dict(mesh.shape).get("data", mesh.devices.size)
    seeds = np.asarray(list(seeds), dtype=np.int64)
    n = len(seeds)

    # Resolve the schedule on host ONCE (discrete schedules call the model's
    # sigma maps, which must not run under a jit trace).
    t_resolved = cfg.resolve_t_steps(denoise.sigma_min, denoise.sigma_max,
                                     sigma_fn=sigma_fn, sigma_inv_fn=sigma_inv_fn)
    cfg = dataclasses.replace(cfg, t_steps=tuple(float(v) for v in t_resolved),
                              dp_list=None)

    conditional = denoise_with_labels is not None and (
        label_dim > 0 or per_seed_cond is not None)
    sharding = pm.data_sharding(mesh, 1 + len(sample_shape))
    # trajectory output carries a leading time axis; batch is axis 1
    out_sharding = (NamedSharding(mesh, P(None, "data"))
                    if return_inters else sharding)
    if jax.process_count() > 1:
        # Multi-host: a cross-process data-sharded output spans
        # non-addressable devices and cannot be fetched with np.asarray.
        # Replicate the (small) sample batch instead -- XLA inserts the
        # all-gather -- so every process holds the full result, mirroring
        # the reference's per-rank gather-free save (sample.py:302-312).
        out_sharding = NamedSharding(mesh, P())
    if per_seed_cond is not None:
        lab_sharding = pm.data_sharding(mesh, per_seed_cond.ndim)
    else:
        lab_sharding = pm.data_sharding(mesh, 2 if label_kind == "onehot" else 1)

    def _post(out):
        return out.xs if return_inters else out

    extra = () if jit_params is None else (jit_params,)
    extra_sh = () if jit_params is None else (pm.replicated(mesh),)

    if conditional:
        def jbody(lat, labels, *p):
            if p:
                bind_params(p[0])
            den = type(denoise)(
                fn=lambda x, t: denoise_with_labels(x, t, labels),
                sigma_min=denoise.sigma_min, sigma_max=denoise.sigma_max)
            return _post(build_sample_fn(
                den, cfg, sigma_fn=sigma_fn, sigma_inv_fn=sigma_inv_fn,
                return_inters=return_inters, dtype=dtype)(lat))

        jfn = jax.jit(jbody,
                      in_shardings=(sharding, lab_sharding) + extra_sh,
                      out_shardings=out_sharding)
    else:
        fn = build_sample_fn(denoise, cfg, sigma_fn=sigma_fn,
                             sigma_inv_fn=sigma_inv_fn,
                             return_inters=return_inters, dtype=dtype)

        def jbody_u(lat, *p):
            if p:
                bind_params(p[0])
            return _post(fn(lat))

        jfn = jax.jit(jbody_u, in_shardings=(sharding,) + extra_sh,
                      out_shardings=out_sharding)

    batch = min(max_batch_size * n_dev, pm.pad_to_multiple(n, n_dev))
    batch = pm.pad_to_multiple(batch, n_dev)
    num_points = (len(cfg.t_steps) + (1 if cfg.denoise_to_zero else 0)
                  if return_inters else 0)
    out = (np.empty((num_points, n) + tuple(sample_shape), dtype=np.float32)
           if return_inters else
           np.empty((n,) + tuple(sample_shape), dtype=np.float32))
    def _drain(pending):
        start, m, dev_x = pending
        x = np.asarray(dev_x, dtype=np.float32)
        if return_inters:
            out[:, start : start + m] = x[:, :m]
        else:
            out[start : start + m] = x[:m]
        if batch_callback is not None:
            batch_callback(start, out[:, start : start + m]
                           if return_inters else out[start : start + m])

    pending = None  # (start, chunk_len, device array) — one batch in flight
    for start in range(0, n, batch):
        chunk = seeds[start : start + batch]
        pad = batch - len(chunk)
        chunk_p = np.concatenate([chunk, chunk[-1:].repeat(pad)]) if pad else chunk
        latents = stacked_randn(jnp.asarray(chunk_p), sample_shape, dtype)
        latents = jax.device_put(latents, sharding)
        if conditional:
            if per_seed_cond is not None:
                # conditioning indexed by position in the seed list
                # (e.g. caption embeddings; sample.py:276-291)
                pos = np.arange(start, start + len(chunk))
                pos = np.concatenate([pos, pos[-1:].repeat(pad)]) if pad else pos
                labels = jnp.asarray(per_seed_cond[pos])
            elif class_idx is not None:
                idx = jnp.full((len(chunk_p),), class_idx, jnp.int32)
                labels = (jax.nn.one_hot(idx, label_dim)
                          if label_kind == "onehot" else idx)
            else:
                from .utils.rng import stacked_randint

                idx = stacked_randint(jnp.asarray(chunk_p), (), 0, label_dim)
                labels = (jax.nn.one_hot(idx, label_dim)
                          if label_kind == "onehot" else idx)
            labels = jax.device_put(labels, lab_sharding)
            dev_x = jfn(latents, labels, *extra)  # async dispatch
        else:
            dev_x = jfn(latents, *extra)  # async dispatch
        if pending is not None:
            _drain(pending)  # host D2H/PNGs overlap the batch just queued
        pending = (start, len(chunk), dev_x)
    if pending is not None:
        _drain(pending)
    return out


def to_uint8(x: np.ndarray) -> np.ndarray:
    """[-1,1] float -> uint8 pixels, matching `sample.py:310-311`."""
    return np.clip(np.asarray(x) * 127.5 + 128, 0, 255).astype(np.uint8)
