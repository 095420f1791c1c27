"""ADM/CM tier parity: Flax ADMUNet / ADMClassifier vs the reference
guided_diffusion torch modules (random init, weights shared via
adm_state_dict_to_params)."""

import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from diff_sampler_tpu.models.adm import (ADMClassifier, ADMUNet,
                                         adm_state_dict_to_params)

KW = dict(image_size=32, in_channels=3, model_channels=32, out_channels=3,
          num_res_blocks=1, attention_resolutions=(2, 4), dropout=0.0,
          channel_mult=(1, 2, 2), num_heads=4, num_head_channels=-1)


@pytest.fixture(scope="module")
def ref_gd(reference_dir):
    base = str(reference_dir / "diff-solvers-main")
    if base not in sys.path:
        sys.path.insert(0, base)
    for m in [k for k in list(sys.modules) if k == "models" or k.startswith("models.")]:
        del sys.modules[m]
    from models.guided_diffusion import unet
    return unet


def _torch_unet(ref_gd, **overrides):
    import torch

    torch.manual_seed(0)
    kw = {**KW, **overrides}
    net = ref_gd.UNetModel(
        image_size=kw["image_size"], in_channels=kw["in_channels"],
        model_channels=kw["model_channels"], out_channels=kw["out_channels"],
        num_res_blocks=kw["num_res_blocks"],
        attention_resolutions=kw["attention_resolutions"],
        dropout=0.0, channel_mult=kw["channel_mult"],
        num_classes=kw.get("num_classes"), num_heads=kw["num_heads"],
        num_head_channels=kw["num_head_channels"],
        use_scale_shift_norm=kw.get("use_scale_shift_norm", False),
        resblock_updown=kw.get("resblock_updown", False),
        use_new_attention_order=kw.get("use_new_attention_order", False))
    net.eval()
    return net, kw


def _compare_unet(ref_gd, tol=2e-4, y=None, **overrides):
    import torch

    net_t, kw = _torch_unet(ref_gd, **overrides)
    params = adm_state_dict_to_params(net_t.state_dict())
    net_j = ADMUNet(**{**kw,
                       "num_classes": kw.get("num_classes"),
                       "use_scale_shift_norm": kw.get("use_scale_shift_norm", False),
                       "resblock_updown": kw.get("resblock_updown", False),
                       "use_new_attention_order": kw.get("use_new_attention_order",
                                                         False)})

    rng = np.random.RandomState(1)
    x = rng.randn(2, 3, 32, 32).astype(np.float32)
    t = np.array([3.0, 250.0], dtype=np.float32)
    with torch.no_grad():
        out_t = net_t(torch.as_tensor(x), torch.as_tensor(t),
                      y=torch.as_tensor(y) if y is not None else None).numpy()
    out_j = net_j.apply({"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)),
                        jnp.asarray(t),
                        jnp.asarray(y) if y is not None else None)
    err = np.abs(np.asarray(out_j).transpose(0, 3, 1, 2) - out_t).max()
    assert err < tol, err


def test_adm_unet_plain(ref_gd):
    _compare_unet(ref_gd)


def test_adm_unet_scale_shift_resblock_updown(ref_gd):
    # the imagenet256 configuration style (cg_model_loader.py:109-127)
    _compare_unet(ref_gd, use_scale_shift_norm=True, resblock_updown=True)


def test_adm_unet_class_conditional(ref_gd):
    _compare_unet(ref_gd, num_classes=10, y=np.array([3, 7]))


def test_adm_unet_new_attention_order(ref_gd):
    _compare_unet(ref_gd, use_new_attention_order=True)


def test_adm_unet_head_channels(ref_gd):
    _compare_unet(ref_gd, num_head_channels=16, num_heads=1)


def test_adm_classifier_attention_pool(ref_gd):
    import torch

    torch.manual_seed(2)
    net_t = ref_gd.EncoderUNetModel(
        image_size=32, in_channels=3, model_channels=32, out_channels=10,
        num_res_blocks=1, attention_resolutions=(2, 4), channel_mult=(1, 2, 2),
        num_head_channels=16, use_scale_shift_norm=True, resblock_updown=True,
        pool="attention")
    net_t.eval()
    params = adm_state_dict_to_params(net_t.state_dict())
    net_j = ADMClassifier(image_size=32, in_channels=3, model_channels=32,
                          out_channels=10, num_res_blocks=1,
                          attention_resolutions=(2, 4), channel_mult=(1, 2, 2),
                          num_head_channels=16, use_scale_shift_norm=True,
                          resblock_updown=True, pool="attention")
    rng = np.random.RandomState(3)
    x = rng.randn(2, 3, 32, 32).astype(np.float32)
    t = np.array([10.0, 500.0], dtype=np.float32)
    with torch.no_grad():
        out_t = net_t(torch.as_tensor(x), torch.as_tensor(t)).numpy()
    out_j = net_j.apply({"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)),
                        jnp.asarray(t))
    err = np.abs(np.asarray(out_j) - out_t).max()
    assert err < 2e-4, err


def test_cg_precond_end_to_end(ref_gd):
    """CGPrecond with the Flax ADM nets: classifier-guided denoising runs and
    matches the reference preconditioner math on shared weights."""
    import torch

    sys.path.insert(0, str(pytest.reference_dir
                           if hasattr(pytest, "reference_dir") else ""))
    from diff_sampler_tpu.models.precond import CGPrecond

    torch.manual_seed(4)
    net_t = ref_gd.UNetModel(image_size=32, in_channels=3, model_channels=32,
                             out_channels=6, num_res_blocks=1,
                             attention_resolutions=(4,), channel_mult=(1, 2),
                             num_classes=10, num_heads=4, num_head_channels=-1,
                             use_scale_shift_norm=True, resblock_updown=True)
    net_t.eval()
    cls_t = ref_gd.EncoderUNetModel(image_size=32, in_channels=3,
                                    model_channels=32, out_channels=10,
                                    num_res_blocks=1, attention_resolutions=(4,),
                                    channel_mult=(1, 2), num_head_channels=16,
                                    use_scale_shift_norm=True,
                                    resblock_updown=True, pool="attention")
    cls_t.eval()

    unet_params = adm_state_dict_to_params(net_t.state_dict())
    cls_params = adm_state_dict_to_params(cls_t.state_dict())
    net_j = ADMUNet(image_size=32, in_channels=3, model_channels=32,
                    out_channels=6, num_res_blocks=1, attention_resolutions=(4,),
                    channel_mult=(1, 2), num_classes=10, num_heads=4,
                    num_head_channels=-1, use_scale_shift_norm=True,
                    resblock_updown=True)
    cls_j = ADMClassifier(image_size=32, in_channels=3, model_channels=32,
                          out_channels=10, num_res_blocks=1,
                          attention_resolutions=(4,), channel_mult=(1, 2),
                          num_head_channels=16, use_scale_shift_norm=True,
                          resblock_updown=True, pool="attention")

    precond = CGPrecond(
        model_fn=lambda x, t, y: net_j.apply({"params": unet_params}, x, t, y),
        classifier_fn=lambda x, t: cls_j.apply({"params": cls_params}, x, t),
        img_resolution=32, img_channels=3, label_dim=10, guidance_rate=1.0)

    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(2, 32, 32, 3).astype(np.float32))
    y = jnp.asarray([1, 8])
    d = precond(x, 2.5, class_labels=y)
    assert d.shape == x.shape
    assert bool(jnp.isfinite(d).all())
    assert float(jnp.abs(d).max()) <= 1.0  # clamp(-1, 1) (networks_edm.py:600)

    # Against the reference CGPrecond math on the same torch nets.
    base = [p for p in sys.path if "diff-solvers-main" in p][0]
    import importlib

    ref_networks = importlib.import_module("models.networks_edm")
    cg_t = ref_networks.CGPrecond(net_t, cls_t, guidance_rate=1.0, label_dim=10)
    xt = torch.as_tensor(np.asarray(x).transpose(0, 3, 1, 2))
    d_t = cg_t(xt, torch.tensor(2.5), class_labels=torch.as_tensor([1, 8]))
    err = np.abs(np.asarray(d).transpose(0, 3, 1, 2) - d_t.detach().numpy()).max()
    assert err < 5e-4, err


@pytest.mark.slow
def test_factory_cm_and_cg_random():
    from diff_sampler_tpu.models.factory import create_model
    from diff_sampler_tpu.models.precond import bind
    from diff_sampler_tpu.ops import get_schedule
    from diff_sampler_tpu.solvers import get_sampler

    pre, params, src = create_model("lsun_bedroom", "random")
    assert src == "cm" and pre.img_resolution == 256
    x = jnp.zeros((1, 256, 256, 3))
    d = pre(x, 2.0)
    assert d.shape == x.shape and bool(jnp.isfinite(d).all())


@pytest.mark.slow
def test_conditional_generate_determinism():
    """Conditional generate(): per-seed labels + images reproduce across
    batch splits (the determinism contract extended to labels)."""
    from diff_sampler_tpu.models.factory import create_model
    from diff_sampler_tpu.models.precond import bind
    from diff_sampler_tpu.sampling import SolverConfig, generate

    module, params, _ = create_model("imagenet64", "random")
    den = bind(module, params)
    cfg = SolverConfig(solver="euler", num_steps=3)
    kw = dict(label_dim=module.label_dim, label_kind="onehot",
              denoise_with_labels=lambda x, t, lab: module.apply(
                  {"params": params}, x, t, lab))
    full = generate(den, range(6), (64, 64, 3), cfg, max_batch_size=6, **kw)
    part = generate(den, range(3, 6), (64, 64, 3), cfg, max_batch_size=3, **kw)
    np.testing.assert_allclose(full[3:], part, atol=1e-5)
