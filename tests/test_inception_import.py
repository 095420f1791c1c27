"""Inception detector import path: restricted plain-pickle loading, the
NVIDIA-pkl order/shape automap, folded-BN identity defaults, and the TF1
asymmetric resize.

The real NVIDIA pkl (`diff-solvers-main/fid.py:34`) is unreachable offline;
the final gated test runs only when it is present locally and is the
feature-parity hook for when network/weights become available.
"""

import os
import pickle

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from diff_sampler_tpu.eval import inception as I


def test_plain_pickle_module_roundtrip(tmp_path):
    """Plain (non-zip) pickles of torch modules load through the restricted
    unpickler with exact tensor values -- the NVIDIA metric pkls use this
    serialization."""
    import torch
    import torch.nn as nn

    from diff_sampler_tpu.models.torch_import import (load_torch_file,
                                                      torch_state_dict)

    torch.manual_seed(0)
    m = nn.Sequential(nn.Conv2d(2, 3, 3), nn.BatchNorm2d(3), nn.Linear(4, 5))
    m[1].running_mean.normal_()
    p = tmp_path / "plain.pkl"
    with open(p, "wb") as f:
        pickle.dump(m, f)

    sd = torch_state_dict(load_torch_file(str(p)))
    ref = {k: v.detach().numpy() for k, v in m.state_dict().items()
           if not k.endswith("num_batches_tracked")}
    assert sorted(sd) == sorted(ref)
    for k in ref:
        np.testing.assert_array_equal(sd[k], ref[k])


def test_plain_pickle_half_and_bf16(tmp_path):
    import torch
    import torch.nn as nn

    from diff_sampler_tpu.models.torch_import import (load_torch_file,
                                                      torch_state_dict)

    for dtype in (torch.float16, torch.bfloat16):
        m = nn.Linear(3, 4).to(dtype)
        p = tmp_path / f"m_{dtype}.pkl"
        with open(p, "wb") as f:
            pickle.dump(m, f)
        sd = torch_state_dict(load_torch_file(str(p)))
        np.testing.assert_allclose(sd["weight"],
                                   m.weight.detach().float().numpy())


def test_folded_bn_identity_defaults():
    """The automap's identity BN (scale=1, mean=0, var=1-eps) must make
    BasicConv2d == conv + bias exactly, so folded-BN sources import
    losslessly."""
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 8, 8, 3).astype(np.float32))
    kern = rng.randn(3, 3, 3, 5).astype(np.float32)
    bias = rng.randn(5).astype(np.float32)

    blk = I.BasicConv2d(5, (3, 3), padding=1)
    params = {"conv": {"kernel": kern}, "bn_scale": np.ones(5, np.float32),
              "bn_bias": bias, "bn_mean": np.zeros(5, np.float32),
              "bn_var": np.full(5, 1.0 - 1e-3, np.float32)}
    out = blk.apply({"params": params}, x)

    ref = jax.lax.conv_general_dilated(
        x, jnp.asarray(kern), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + bias
    np.testing.assert_allclose(np.asarray(out), np.asarray(jax.nn.relu(ref)),
                               rtol=1e-6, atol=1e-6)


def test_tf1_resize_bilinear():
    # Identity when sizes match the source grid exactly at integer coords.
    x = jnp.arange(2 * 4 * 4 * 1, dtype=jnp.float32).reshape(2, 4, 4, 1)
    same = I._tf1_resize_bilinear(x, 4, 4)
    np.testing.assert_allclose(np.asarray(same), np.asarray(x), atol=1e-6)

    # Hand-computed asymmetric upsample: in=2 -> out=4 gives src coords
    # [0, 0.5, 1, 1.5] (clamped), i.e. [a, (a+b)/2, b, b] per axis.
    y = jnp.asarray([[1.0, 3.0]]).reshape(1, 1, 2, 1)
    out = np.asarray(I._tf1_resize_bilinear(y, 1, 4))[0, 0, :, 0]
    np.testing.assert_allclose(out, [1.0, 2.0, 3.0, 3.0], atol=1e-6)


@pytest.fixture(scope="module")
def flax_inception():
    net = I.InceptionV3FID()
    params = jax.jit(net.init)(jax.random.key(0),
                               jnp.zeros((1, 32, 32, 3), jnp.uint8))["params"]
    return net, params


@pytest.mark.slow
def test_automap_roundtrip(flax_inception):
    """Serialize our own inception params into an NVIDIA-style flat tensor
    dict (TF-ish names, OIHW kernels, graph order) and automap it back: the
    tree must round-trip exactly.  Pins the graph-order table, the
    transposes, and the 1-D name heuristics."""
    net, params = flax_inception

    flat = {}
    for i, path in enumerate(I.CONV_UNITS_GRAPH_ORDER):
        node = params
        for p in path:
            node = node[p]
        base = f"layers.unit{i:03d}"
        flat[f"{base}.weight"] = np.asarray(node["conv"]["kernel"]).transpose(3, 2, 0, 1)
        flat[f"{base}.gamma"] = np.asarray(node["bn_scale"])
        flat[f"{base}.beta"] = np.asarray(node["bn_bias"])
        flat[f"{base}.running_mean"] = np.asarray(node["bn_mean"])
        flat[f"{base}.running_var"] = np.asarray(node["bn_var"])
    flat["output.weight"] = np.zeros((1008, 2048), np.float32)  # unused head
    # regression: the real detector's 1008-way logits BIAS arrives after the
    # last conv; it must land in 'unused', not overwrite that unit's BN
    # (its width differs from the last conv's out_ch)
    flat["output.bias"] = np.zeros((1008,), np.float32)

    mapped, report = I._automap_conv_bn(flat)
    assert report["n_units"] == len(I.CONV_UNITS_GRAPH_ORDER)
    assert report["unused"] == ["output.weight", "output.bias"]
    jax.tree.map(np.testing.assert_array_equal, mapped, params)


@pytest.mark.slow
def test_automap_folded_bn_forward(flax_inception):
    """A folded-BN source (kernel + beta only) must automap to a net whose
    features equal folding BN into the kernel by hand."""
    net, params = flax_inception

    rng = np.random.RandomState(3)
    flat, folded_params = {}, jax.tree.map(np.asarray, params)
    for i, path in enumerate(I.CONV_UNITS_GRAPH_ORDER):
        node = folded_params
        for p in path:
            node = node[p]
        k = node["conv"]["kernel"]
        beta = rng.randn(k.shape[-1]).astype(np.float32) * 0.01
        base = f"layers.u{i:03d}"
        flat[f"{base}.weight"] = k.transpose(3, 2, 0, 1)
        flat[f"{base}.beta"] = beta
        node["bn_scale"] = np.ones(k.shape[-1], np.float32)
        node["bn_bias"] = beta
        node["bn_mean"] = np.zeros(k.shape[-1], np.float32)
        node["bn_var"] = np.full(k.shape[-1], 1.0 - 1e-3, np.float32)

    mapped, _ = I._automap_conv_bn(flat)
    imgs = rng.randint(0, 256, (2, 32, 32, 3)).astype(np.uint8)
    f_mapped = net.apply({"params": mapped}, jnp.asarray(imgs))
    f_manual = net.apply({"params": folded_params}, jnp.asarray(imgs))
    np.testing.assert_allclose(np.asarray(f_mapped), np.asarray(f_manual),
                               rtol=1e-5, atol=1e-5)


NVIDIA_PKL_CANDIDATES = [
    "src/inception-2015-12-05.pkl",
    "models/inception-2015-12-05.pkl",
    "checkpoints/inception-2015-12-05.pkl",
]


@pytest.mark.slow
def test_nvidia_pkl_import_if_present():
    """Feature-parity hook: runs only when the real NVIDIA detector pkl is
    available locally (offline env cannot download it -- BENCH_NOTES.md)."""
    path = next((p for p in NVIDIA_PKL_CANDIDATES if os.path.isfile(p)), None)
    if path is None:
        pytest.skip("NVIDIA inception pkl not available (offline env)")
    params, report = I.import_nvidia_inception_pickle(path)
    net = I.InceptionV3FID(tf_preprocessing=True)
    imgs = np.random.RandomState(0).randint(0, 256, (2, 32, 32, 3)).astype(np.uint8)
    feats = net.apply({"params": params}, jnp.asarray(imgs))
    assert feats.shape == (2, 2048)
    assert np.all(np.isfinite(np.asarray(feats)))
