"""Numerical parity of the Flax U-Nets + EDM preconditioner against the
reference torch implementation: random-init torch net -> state_dict ->
Flax params (torch_import) -> max |D_jax - D_torch| < 1e-4 fp32 on random
(x, sigma).  This pins layer semantics (fused resample convs, GroupNorm eps,
fp32 attention, skip-concat order, embedding swaps)."""

import sys

import numpy as np
import pytest

import jax.numpy as jnp

from diff_sampler_tpu.models import precond as P
from diff_sampler_tpu.models.torch_import import state_dict_to_params


@pytest.fixture(scope="module")
def ref_networks(reference_dir):
    base = str(reference_dir / "diff-solvers-main")
    for p in (base,):
        if p not in sys.path:
            sys.path.insert(0, p)
    from models import networks_edm  # noqa
    return networks_edm


def _compare(ref_networks, model_type, model_kwargs, label_dim=0, res=16, ch=3,
             tol=1e-4, **extra):
    import torch

    torch.manual_seed(0)
    net_t = ref_networks.EDMPrecond(
        img_resolution=res, img_channels=ch, label_dim=label_dim,
        model_type=model_type, **model_kwargs)
    net_t.eval()

    params = state_dict_to_params(net_t.state_dict())
    net_j = P.EDMPrecond(img_resolution=res, img_channels=ch, label_dim=label_dim,
                         model_type=model_type,
                         model_kwargs={**model_kwargs, "dropout": 0.0})

    rng = np.random.RandomState(1)
    x = rng.randn(2, ch, res, res).astype(np.float32)
    sigma = np.array([0.5, 7.3], dtype=np.float32)
    labels = None
    if label_dim:
        labels = np.eye(label_dim, dtype=np.float32)[rng.randint(0, label_dim, 2)]

    with torch.no_grad():
        d_t = net_t(torch.as_tensor(x), torch.as_tensor(sigma),
                    class_labels=torch.as_tensor(labels) if labels is not None else None,
                    **extra).numpy()

    d_j = net_j.apply({"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)),
                      jnp.asarray(sigma),
                      jnp.asarray(labels) if labels is not None else None)
    d_j = np.asarray(d_j).transpose(0, 3, 1, 2)
    err = np.abs(d_j - d_t).max()
    assert err < tol, f"max |D_jax - D_torch| = {err}"


# dropout=0: sampling-path comparison (both nets in eval/deterministic mode).
DDPM_KW = dict(model_channels=16, channel_mult=[1, 2], num_blocks=1,
               attn_resolutions=[8], dropout=0.0, embedding_type="positional",
               encoder_type="standard", decoder_type="standard",
               channel_mult_noise=1, resample_filter=[1, 1])
NCSN_KW = dict(model_channels=16, channel_mult=[1, 2, 2], num_blocks=1,
               attn_resolutions=[8], dropout=0.0, embedding_type="fourier",
               encoder_type="residual", decoder_type="standard",
               channel_mult_noise=2, resample_filter=[1, 3, 3, 1])
SKIP_KW = dict(model_channels=16, channel_mult=[1, 2], num_blocks=1,
               attn_resolutions=[8], dropout=0.0, embedding_type="positional",
               encoder_type="skip", decoder_type="skip",
               channel_mult_noise=1, resample_filter=[1, 1])
ADM_KW = dict(model_channels=64, channel_mult=[1, 2], num_blocks=1,
              attn_resolutions=[8], dropout=0.0)


def test_songunet_ddpmpp(ref_networks):
    _compare(ref_networks, "SongUNet", DDPM_KW)


def test_songunet_ddpmpp_conditional(ref_networks):
    _compare(ref_networks, "SongUNet", DDPM_KW, label_dim=10)


def test_songunet_ncsnpp(ref_networks):
    _compare(ref_networks, "SongUNet", NCSN_KW)


def test_songunet_skip_encoder_decoder(ref_networks):
    _compare(ref_networks, "SongUNet", SKIP_KW)


def test_dhariwal_unet(ref_networks):
    _compare(ref_networks, "DhariwalUNet", ADM_KW, label_dim=5)


def test_sfd_step_condition_and_skip_tuning(reference_dir):
    """Parity of the SFD model extensions (step_condition + skip_tuning)
    against sfd-main/models/networks_edm.py."""
    import torch

    base = str(reference_dir / "sfd-main")
    sys.path.insert(0, base)
    try:
        # sfd's models package collides with diff-solvers'; force re-import.
        for m in [k for k in list(sys.modules) if k == "models" or k.startswith("models.")]:
            del sys.modules[m]
        from models import networks_edm as sfd_networks
    finally:
        sys.path.pop(0)
        for m in [k for k in list(sys.modules) if k == "models" or k.startswith("models.")]:
            del sys.modules[m]

    torch.manual_seed(0)
    kw = dict(DDPM_KW)
    net_t = sfd_networks.EDMPrecond(img_resolution=16, img_channels=3, label_dim=0,
                                    model_type="SongUNet", **kw)
    net_t.eval()
    params = state_dict_to_params(net_t.state_dict())
    net_j = P.EDMPrecond(img_resolution=16, img_channels=3, label_dim=0,
                         model_type="SongUNet",
                         model_kwargs={**kw, "use_step_condition": True})

    rng = np.random.RandomState(2)
    x = rng.randn(2, 3, 16, 16).astype(np.float32)
    sigma = np.array([1.1, 20.0], dtype=np.float32)
    with torch.no_grad():
        d_t = net_t(torch.as_tensor(x), torch.as_tensor(sigma),
                    step_condition=torch.as_tensor([4.0, 4.0]),
                    skip_tuning=True).numpy()
    d_j = net_j.apply({"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)),
                      jnp.asarray(sigma), step_condition=jnp.asarray([4.0, 4.0]),
                      skip_tuning=True)
    err = np.abs(np.asarray(d_j).transpose(0, 3, 1, 2) - d_t).max()
    assert err < 1e-4, err
