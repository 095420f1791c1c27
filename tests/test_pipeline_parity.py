"""End-to-end IMAGE-LEVEL pipeline parity with the reference.

Runs the reference's full torch sampling pipeline (model wrap -> in-sampler
get_schedule -> sampler loop -> image floats, `diff-solvers-main/
sample.py:267-316`) and our `sampling.generate` (mesh-sharded, scan-based,
per-seed RNG) on the SAME random-init U-Net weights and IDENTICAL latents,
asserting max |pixel diff| < 1e-3 over a full NFE-35 run.

This is the strongest offline substitute for real-checkpoint FID parity
(no network in this env -- see BENCH_NOTES.md "FID parity status"): it pins
the entire generation pipeline end-to-end, so with real weights the only
untested step is the checkpoint download itself (scripts/fid_parity.py is
the ready-to-run harness for that).

Note: SongUNet's final aux_conv is zero-init (networks_edm.py:310), which
would make D(x,s) = c_skip*x and hide any U-Net pipeline divergence -- the
fixture re-randomizes those weights so F(x) contributes O(0.1) signal that
compounds over all 35 steps.
"""

import sys

import numpy as np
import pytest

import jax.numpy as jnp

from diff_sampler_tpu import sampling
from diff_sampler_tpu.models import precond as P
from diff_sampler_tpu.models.torch_import import state_dict_to_params
from diff_sampler_tpu.sampling import SolverConfig
from diff_sampler_tpu.utils.rng import stacked_randn

RES, CH = 16, 3
KW = dict(model_channels=16, channel_mult=[1, 2], num_blocks=1,
          attn_resolutions=[8], dropout=0.0, embedding_type="positional",
          encoder_type="standard", decoder_type="standard",
          channel_mult_noise=1, resample_filter=[1, 1])


@pytest.fixture(scope="module")
def nets(reference_dir):
    """(torch net, flax net, flax params) sharing identical weights."""
    import torch

    base = str(reference_dir / "diff-solvers-main")
    if base not in sys.path:
        sys.path.insert(0, base)
    for m in [k for k in list(sys.modules) if k == "models" or k.startswith("models.")]:
        del sys.modules[m]
    from models import networks_edm

    torch.manual_seed(0)
    net_t = networks_edm.EDMPrecond(img_resolution=RES, img_channels=CH,
                                    label_dim=0, model_type="SongUNet", **KW)
    # Re-randomize the zero-init output conv so F(x) is non-trivial.
    sd = net_t.state_dict()
    g = torch.Generator().manual_seed(1)
    for k in sd:
        if "aux_conv" in k:
            sd[k] = 0.05 * torch.randn(sd[k].shape, generator=g)
    net_t.load_state_dict(sd)
    net_t.eval()

    params = state_dict_to_params(net_t.state_dict())
    net_j = P.EDMPrecond(img_resolution=RES, img_channels=CH, label_dim=0,
                         model_type="SongUNet", model_kwargs=dict(KW))
    return net_t, net_j, params


def _reference_pipeline(net_t, latents_nhwc, solver, num_steps, **kw):
    """The reference sample.py batch-loop body: latents -> image floats."""
    import torch

    import solvers as ref_solvers  # diff-solvers-main on sys.path via fixture

    fn = {"ipndm": ref_solvers.ipndm_sampler,
          "euler": ref_solvers.euler_sampler,
          "dpmpp": ref_solvers.dpm_pp_sampler}[solver]
    latents_t = torch.as_tensor(
        np.ascontiguousarray(latents_nhwc.transpose(0, 3, 1, 2)))
    with torch.no_grad():
        images = fn(net_t, latents_t, class_labels=None, num_steps=num_steps,
                    sigma_min=net_t.sigma_min, sigma_max=net_t.sigma_max,
                    schedule_type="polynomial", schedule_rho=7, **kw)
    return images.numpy().transpose(0, 2, 3, 1)


def _ours(net_j, params, seeds, cfg):
    den = P.bind(net_j, params)
    return sampling.generate(den, seeds, (RES, RES, CH), cfg, max_batch_size=4)


CASES = [
    # The VERDICT-mandated full NFE-35 run, plus few-NFE operating points.
    ("ipndm", 36, dict()),
    ("ipndm", 6, dict(afs=True)),
    ("euler", 6, dict(denoise_to_zero=True)),
    ("dpmpp", 11, dict(max_order=3)),
]


@pytest.mark.slow
@pytest.mark.parametrize("solver,num_steps,kw",
                         CASES, ids=[f"{s}-n{n}" for s, n, _ in CASES])
def test_pipeline_image_parity(nets, solver, num_steps, kw):
    net_t, net_j, params = nets
    seeds = list(range(8))

    # Identical latents: generate() draws stacked_randn(seeds) internally;
    # feed the very same array to the torch pipeline.
    latents = np.asarray(
        stacked_randn(jnp.asarray(np.asarray(seeds, np.int64)),
                      (RES, RES, CH), jnp.float32))

    theirs = _reference_pipeline(net_t, latents, solver, num_steps, **kw)
    ours = _ours(net_j, params, seeds,
                 SolverConfig(solver=solver, num_steps=num_steps, **kw))

    assert ours.shape == theirs.shape
    err = np.abs(ours - theirs).max()
    assert err < 1e-3, f"max |pixel diff| = {err} ({solver} n={num_steps})"

    # And after uint8 quantization (what lands in the PNGs fed to FID),
    # at most an off-by-one level anywhere.
    q_ours = sampling.to_uint8(ours).astype(np.int32)
    q_theirs = sampling.to_uint8(theirs).astype(np.int32)
    assert np.abs(q_ours - q_theirs).max() <= 1
