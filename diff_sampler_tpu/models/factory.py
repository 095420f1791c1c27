"""Model factory: dataset name -> wrapped denoiser (module, params, source).

Rebuilds `diff-solvers-main/sample.py:76-121` + the arch tables of
`sfd-main/training/training_loop.py:46-110`.  Because our checkpoint loader
never executes pickled class code, the per-dataset architectures are spelled
out here instead of being resurrected from the pickle.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from .precond import EDMPrecond

__all__ = ["EDM_ARCHS", "build_edm_model", "create_model"]

# dataset -> (interface kwargs, SongUNet/DhariwalUNet kwargs)
# (sfd-main/training/training_loop.py:59-77)
EDM_ARCHS: Dict[str, Tuple[Dict[str, Any], Dict[str, Any]]] = {
    "cifar10": (
        dict(img_resolution=32, img_channels=3, label_dim=0,
             model_type="SongUNet"),
        dict(embedding_type="positional", encoder_type="standard",
             decoder_type="standard", channel_mult_noise=1,
             resample_filter=[1, 1], model_channels=128,
             channel_mult=[2, 2, 2], dropout=0.13, augment_dim=9),
    ),
    "ffhq": (
        dict(img_resolution=64, img_channels=3, label_dim=0,
             model_type="SongUNet"),
        dict(embedding_type="positional", encoder_type="standard",
             decoder_type="standard", channel_mult_noise=1,
             resample_filter=[1, 1], model_channels=128,
             channel_mult=[1, 2, 2, 2], dropout=0.05, augment_dim=9),
    ),
    "imagenet64": (
        dict(img_resolution=64, img_channels=3, label_dim=1000,
             model_type="DhariwalUNet"),
        dict(model_channels=192, channel_mult=[1, 2, 3, 4]),
    ),
}
EDM_ARCHS["afhqv2"] = EDM_ARCHS["ffhq"]


def build_edm_model(dataset_name: str, *, use_step_condition: bool = False,
                    dtype=jnp.float32, sigma_min: Optional[float] = None,
                    sigma_max: float = 80.0, remat: bool = False) -> EDMPrecond:
    """Construct the (uninitialized) EDMPrecond module for a dataset.

    remat=True enables block-granular rematerialization (training memory)."""
    interface, kwargs = EDM_ARCHS[dataset_name]
    kwargs = dict(kwargs)
    if use_step_condition:
        kwargs["use_step_condition"] = True
    if remat:
        kwargs["remat"] = True
    # sfd training_loop.py:83-84 narrows sigma_min to 0.006 for EDM models at
    # distillation time; sampling uses the checkpoint's native 0.002.
    return EDMPrecond(sigma_min=sigma_min if sigma_min is not None else 0.002,
                      sigma_max=sigma_max, dtype=dtype,
                      model_kwargs=kwargs, **interface)


def init_params(module: EDMPrecond, seed: int = 0):
    res, ch = module.img_resolution, module.img_channels
    # jit the init: eager flax init over the axon TPU tunnel is minutes-slow
    return jax.jit(module.init)(jax.random.key(seed),
                                jnp.zeros((1, res, res, ch)),
                                jnp.ones((1,)))["params"]


def create_model(dataset_name: str, model_path: Optional[str] = None,
                 guidance_type: Optional[str] = None,
                 guidance_rate: float = 1.0, dtype=jnp.float32):
    """Returns (precond_module, params, model_source).

    With model_path=None, resolves the checkpoint through the zoo registry
    (requires network or a local file); with model_path='random', returns
    freshly initialized parameters (useful for smoke tests/benchmarks).
    """
    if dataset_name in EDM_ARCHS:
        module = build_edm_model(dataset_name, dtype=dtype)
        if model_path == "random":
            return module, init_params(module), "edm"
        if model_path is None:
            from .zoo import check_file_by_key

            model_path, _ = check_file_by_key(dataset_name)
        from .zoo import load_checkpoint_params

        return module, load_checkpoint_params(model_path), "edm"
    if dataset_name in ("lsun_bedroom", "lsun_cat"):
        # lsun_cat is in the reference's CLI choice list
        # (amed-solver-main/train.py:18) but has NO checkpoint URL or
        # create_model branch there; we route it through the CM tier and
        # require an explicit local checkpoint.
        if dataset_name == "lsun_cat" and model_path is None:
            raise ValueError(
                "lsun_cat has no registered checkpoint URL (the reference "
                "publishes none either, torch_utils/download_util.py:6-19); "
                "pass --model_path to a local CM checkpoint")
        return (*build_cm_model(model_path, dtype=dtype), "cm")
    if dataset_name == "imagenet256":
        return (*build_cg_model(model_path, guidance_rate, dtype=dtype), "adm")
    if dataset_name in ("lsun_bedroom_ldm", "ffhq_ldm", "ms_coco"):
        return (*build_ldm_model(dataset_name, model_path,
                                 guidance_type=guidance_type,
                                 guidance_rate=guidance_rate, dtype=dtype),
                "ldm" if dataset_name != "ms_coco" else "sd")
    raise NotImplementedError(
        f"model tier for '{dataset_name}' not wired into the factory; "
        f"available: cifar10/ffhq/afhqv2/imagenet64/lsun_bedroom/imagenet256/"
        f"lsun_bedroom_ldm/ffhq_ldm/ms_coco")


def build_ldm_model(dataset_name, model_path=None, guidance_type=None,
                    guidance_rate=1.0, dtype=jnp.float32, remat=False):
    """LDM/SD checkpoints -> CFGPrecond over a LatentDiffusion stack
    (sfd training_loop.py:86-108 create_model LDM branch).
    remat enables block-granular rematerialization (training memory)."""
    from .ldm import build_latent_diffusion
    from .precond import CFGPrecond

    state_dict = None
    if model_path not in (None, "random"):
        from .torch_import import load_torch_file, torch_state_dict

        state_dict = torch_state_dict(load_torch_file(model_path))
    elif model_path is None:
        from .zoo import check_file_by_key

        model_path, _companions = check_file_by_key(dataset_name)
        from .torch_import import load_torch_file, torch_state_dict

        state_dict = torch_state_dict(load_torch_file(model_path))

    cond_fn = None
    if dataset_name == "ms_coco" and state_dict is not None:
        from .ldm import ldm_state_dict_to_params
        from .text import FrozenCLIPEmbedder, clip_text_params_from_state_dict

        trees = ldm_state_dict_to_params(state_dict)
        if trees["cond_stage"]:
            cond_fn = FrozenCLIPEmbedder(
                clip_text_params_from_state_dict(trees["cond_stage"]))

    ld = build_latent_diffusion(dataset_name, state_dict=state_dict,
                                cond_stage_fn=cond_fn, dtype=dtype,
                                remat=remat)

    unet_bneck = _capture_middle_lazy(ld)
    res, chn = ld.unet.image_size, ld.unet.in_channels
    if dataset_name == "ms_coco":
        precond = CFGPrecond(
            model_fn=lambda x, t, cond: ld.apply_model(x, t, cond),
            alphas_cumprod=ld.alphas_cumprod, img_resolution=res,
            img_channels=chn, guidance_type="classifier-free",
            guidance_rate=guidance_rate, epsilon_t=1e-3, label_dim=1,
            model_fn_bottleneck=unet_bneck)
        precond.sigma_min = 0.1  # sfd training_loop.py:105
    else:
        precond = CFGPrecond(
            model_fn=lambda x, t, cond: ld.apply_model(x, t, None),
            alphas_cumprod=ld.alphas_cumprod, img_resolution=res,
            img_channels=chn, guidance_type="uncond", guidance_rate=1.0,
            label_dim=0,
            model_fn_bottleneck=lambda x, t, cond: unet_bneck(x, t, None))
        precond.sigma_min = 0.006  # sfd training_loop.py:94,99
    precond.latent_diffusion = ld
    return precond, None


def shard_ldm_tensor_parallel(precond, mesh):
    """Shard the latent U-Net weights Megatron-style over the mesh's 'model'
    axis (parallel/tp.py); the denoise path picks them up late-bound through
    LatentDiffusion.apply_model, and the AMED bottleneck tap is re-captured
    so every closure sees the same committed arrays."""
    from ..parallel import tp

    ld = precond.latent_diffusion
    ld.unet_params = tp.shard_params_tp(ld.unet_params, mesh)
    # model_fn / model_fn_bottleneck read ld.unet_params at call time
    # (_capture_middle_lazy, ldm.py:595) so they pick the shards up here
    return precond


def shard_pixel_tensor_parallel(precond, params, mesh, model_source):
    """Tensor-parallel sharding for the PIXEL tiers (edm/cm/adm), mirroring
    shard_ldm_tensor_parallel: shard the U-Net weight tree Megatron-style
    over the mesh's 'model' axis and rebuild any closures so they see the
    committed arrays.

    Returns the sharded params (tree for 'edm'; for 'cm'/'adm' the precond's
    model_fn/classifier_fn/bottleneck closures are rebuilt in place and the
    sharded tree(s) are returned in the same structure create_model used).
    tp_param_specs already understands SongUNet (conv0/conv1/qkv/proj) and
    ADM (in_layers_2/out_layers_3/qkv/proj_out) module naming."""
    from ..parallel import tp

    if model_source == "edm":
        return tp.shard_params_tp(params, mesh)
    if model_source == "cm":
        net = precond.net
        sharded = tp.shard_params_tp(params, mesh)
        precond.model_fn = lambda x, t, y: net.apply(
            {"params": sharded}, x, t, None)
        precond.model_fn_bottleneck = _capture_middle(net, sharded)
        return sharded
    if model_source == "adm":
        net, cls = precond.net, precond.classifier
        sharded = tp.shard_params_tp(params["model"], mesh)
        cls_sharded = tp.shard_params_tp(params["classifier"], mesh)
        precond.model_fn = lambda x, t, y: net.apply(
            {"params": sharded}, x, t, y)
        precond.classifier_fn = lambda x, t: cls.apply(
            {"params": cls_sharded}, x, t)
        precond.model_fn_bottleneck = _capture_middle(net, sharded)
        return {"model": sharded, "classifier": cls_sharded}
    raise ValueError(f"unknown pixel model_source {model_source!r}")


def _adm_params(module, model_path, seed):
    if model_path == "random":
        res, ch = module.image_size, module.in_channels
        init_args = [jax.random.key(seed), jnp.zeros((1, res, res, ch)),
                     jnp.ones((1,))]
        if getattr(module, "num_classes", None):
            # class-conditional ADM (imagenet256): init needs a label to
            # trace the label-embedding table lookup
            init_args.append(jnp.zeros((1,), jnp.int32))
        return jax.jit(module.init)(*init_args)["params"]
    from .adm import adm_state_dict_to_params
    from .torch_import import load_torch_file, torch_state_dict

    return adm_state_dict_to_params(torch_state_dict(load_torch_file(model_path)))


def build_cm_model(model_path=None, dtype=jnp.float32):
    """LSUN-Bedroom consistency-models checkpoint -> CMPrecond
    (cm_model_loader.py:95-127, networks_edm.py:504-552)."""
    from .adm import ADMUNet, CM_LSUN_SETTING
    from .precond import CMPrecond

    net = ADMUNet(dtype=dtype, **CM_LSUN_SETTING)
    if model_path is None:
        from .zoo import check_file_by_key

        model_path, _ = check_file_by_key("lsun_bedroom")
    params = _adm_params(net, model_path, 0)

    def model_fn(x, rescaled_t, class_labels):
        return net.apply({"params": params}, x, rescaled_t, None)

    precond = CMPrecond(model_fn=model_fn, img_resolution=256, img_channels=3,
                        label_dim=0,
                        model_fn_bottleneck=_capture_middle(net, params))
    precond.net = net  # for shard_pixel_tensor_parallel closure rebuilds
    return precond, params


def _capture_middle_lazy(ld):
    """LDM variant of _capture_middle reading ld.unet_params at CALL time —
    the same late binding as LatentDiffusion.apply_model (ldm.py:595).  A
    jit caller can then route the 274–860M tree as an ARGUMENT (assign the
    tracer to ld.unet_params inside the traced fn) instead of embedding it
    as HLO constants, which stalls the axon remote compile (BENCH_NOTES)."""

    def fn(x, t, cond):
        return ld.unet.apply({"params": ld.unet_params}, x, t, cond,
                             return_bottleneck=True)

    return fn


def _capture_middle(net, params):
    """model_fn variant returning (out, middle-block activation) -- the AMED
    bottleneck tap for 256-res CM/ADM and LDM.  ADMUNet and LDMUNet expose
    the middle-block output as an explicit second return value
    (return_bottleneck=True): the TPU-first replacement for the reference's
    forward hook on `model.middle_block` (solvers_amed.py:7-15)."""

    def fn(x, t, cond):
        return net.apply({"params": params}, x, t, cond,
                         return_bottleneck=True)

    return fn


def build_cg_model(model_path=None, guidance_rate=1.0, classifier_path=None,
                   dtype=jnp.float32):
    """ImageNet-256 ADM + noisy classifier -> CGPrecond
    (cg_model_loader.py:109-160, networks_edm.py:557-625)."""
    from .adm import (ADMClassifier, ADMUNet, IMAGENET256_CLASSIFIER_SETTING,
                      IMAGENET256_SETTING)
    from .precond import CGPrecond

    net = ADMUNet(dtype=dtype, **IMAGENET256_SETTING)
    cls = ADMClassifier(dtype=dtype, **IMAGENET256_CLASSIFIER_SETTING)
    if model_path is None:
        from .zoo import check_file_by_key

        model_path, companions = check_file_by_key("imagenet256")
        classifier_path = companions[0]
    params = _adm_params(net, model_path, 0)
    if model_path == "random":
        res = cls.image_size
        cls_params = jax.jit(cls.init)(jax.random.key(1),
                                       jnp.zeros((1, res, res, 3)),
                                       jnp.ones((1,)))["params"]
    else:
        from .adm import adm_state_dict_to_params
        from .torch_import import load_torch_file, torch_state_dict

        cls_params = adm_state_dict_to_params(
            torch_state_dict(load_torch_file(classifier_path)))

    precond = CGPrecond(
        model_fn=lambda x, t, y: net.apply({"params": params}, x, t, y),
        classifier_fn=lambda x, t: cls.apply({"params": cls_params}, x, t),
        img_resolution=256, img_channels=3, label_dim=1000,
        guidance_rate=guidance_rate,
        model_fn_bottleneck=_capture_middle(net, params))
    precond.net, precond.classifier = net, cls  # for TP closure rebuilds
    return precond, {"model": params, "classifier": cls_params}
