"""Restricted checkpoint loader tests: real torch.save files (state_dict AND
whole-module pickles) load without executing any module code."""

import numpy as np
import pytest

from diff_sampler_tpu.models.torch_import import (load_torch_file,
                                                  state_dict_to_params,
                                                  torch_state_dict)


import torch as _torch


class _Block(_torch.nn.Module):
    def __init__(self):
        super().__init__()
        self.conv = _torch.nn.Conv2d(3, 8, 3)
        self.norm = _torch.nn.GroupNorm(2, 8)
        self.register_buffer("sigma_table", _torch.linspace(0, 1, 5))


class _Net(_torch.nn.Module):
    def __init__(self):
        super().__init__()
        self.block = _Block()
        self.fc = _torch.nn.Linear(8, 4)


def _tiny_module():
    _torch.manual_seed(0)
    return _Net()


def test_load_state_dict_file(tmp_path):
    import torch

    net = _tiny_module()
    p = str(tmp_path / "sd.pt")
    torch.save(net.state_dict(), p)
    obj = load_torch_file(p)
    sd = torch_state_dict(obj)
    assert set(sd) == set(net.state_dict())
    np.testing.assert_allclose(sd["block.conv.weight"],
                               net.block.conv.weight.detach().numpy())
    np.testing.assert_allclose(sd["block.sigma_table"],
                               net.block.sigma_table.numpy())


def test_load_whole_module_pickle(tmp_path):
    """EDM-style: the checkpoint pickles the MODULE OBJECT, not a state_dict
    (sample.py:82: pickle.load(f)['ema']).  The loader must extract tensors
    WITHOUT executing the module class."""
    import torch

    net = _tiny_module()
    p = str(tmp_path / "module.pkl")
    torch.save({"ema": net, "meta": {"note": "x"}}, p)
    obj = load_torch_file(p)
    sd = torch_state_dict(obj["ema"])
    ref = {k: v.detach().numpy() for k, v in net.state_dict().items()}
    assert set(sd) == set(ref)
    for k in ref:
        np.testing.assert_allclose(sd[k], ref[k], err_msg=k)


def test_container_routing(tmp_path):
    import torch

    net = _tiny_module()
    p = str(tmp_path / "wrap.pkl")
    torch.save({"ema": net}, p)
    sd = torch_state_dict(load_torch_file(p))
    assert "block.conv.weight" in sd


def test_params_conversion_ranks(tmp_path):
    import torch

    net = _tiny_module()
    p = str(tmp_path / "sd2.pt")
    torch.save(net.state_dict(), p)
    params = state_dict_to_params(torch_state_dict(load_torch_file(p)))
    assert params["block"]["conv"]["kernel"].shape == (3, 3, 3, 8)  # HWIO
    assert params["fc"]["kernel"].shape == (8, 4)  # transposed
    assert "scale" in params["block"]["norm"]
