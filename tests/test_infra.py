"""Infra tests: checkpoint roundtrip + run dirs, training stats, common
utilities, model zoo registry, factory, image IO."""

import os

import numpy as np
import pytest

from diff_sampler_tpu.models.factory import EDM_ARCHS, build_edm_model
from diff_sampler_tpu.models.zoo import CHECKPOINT_URLS, MODEL_SPECS, check_file_by_key
from diff_sampler_tpu.utils import checkpoint as ckpt
from diff_sampler_tpu.utils import stats as ts
from diff_sampler_tpu.utils.common import (EasyDict, construct_class_by_name,
                                           format_time)
from diff_sampler_tpu.utils.image import parse_int_list, save_grid, save_images
from diff_sampler_tpu.utils.profiling import assert_shape, print_param_summary


def test_checkpoint_roundtrip(tmp_path):
    params = {"model": {"conv": {"kernel": np.arange(12.0).reshape(3, 4),
                                 "bias": np.zeros(4)}},
              "norm": {"scale": np.ones(3)}}
    opt = {"mu": {"x": np.ones(2)}}
    p = str(tmp_path / "snap.npz")
    ckpt.save_params(p, params, opt_state=opt)
    out = ckpt.load_params(p)
    np.testing.assert_array_equal(out["params"]["model"]["conv"]["kernel"],
                                  params["model"]["conv"]["kernel"])
    np.testing.assert_array_equal(out["opt_state"]["mu"]["x"], opt["mu"]["x"])


def test_run_dir_convention(tmp_path):
    base = str(tmp_path / "exps")
    d0 = ckpt.create_run_dir(base, "cifar10-test")
    d1 = ckpt.create_run_dir(base, "other")
    assert os.path.basename(d0).startswith("00000-")
    assert os.path.basename(d1).startswith("00001-")
    assert ckpt.find_run_dir(base, 1) == d1
    assert ckpt.find_run_dir(base, 7) is None


def test_config_sidecar(tmp_path):
    from diff_sampler_tpu.training.amed import AMEDConfig

    p = str(tmp_path / "cfg.json")
    cfg = AMEDConfig(num_steps=5, sampler_stu="ipndm")
    ckpt.save_config(p, cfg)
    loaded = ckpt.load_config(p)
    assert loaded["num_steps"] == 5 and loaded["sampler_stu"] == "ipndm"
    # restore-at-sample-time: rebuild the config from the sidecar
    restored = AMEDConfig(**{k: v for k, v in loaded.items()
                             if k in AMEDConfig.__dataclass_fields__})
    assert restored.num_steps == 5


def test_training_stats():
    ts.report("a", [1.0, 2.0, 3.0])
    ts.report("a", 4.0)
    c = ts.Collector()
    c.update()
    assert c.num("a") == 4
    assert abs(c.mean("a") - 2.5) < 1e-9
    assert abs(c.std("a") - np.std([1, 2, 3, 4])) < 1e-9
    c.reset()
    assert c.num("a") == 0


def test_common_utils():
    d = EasyDict(a=1)
    d.b = 2
    assert d.a == 1 and d["b"] == 2
    with pytest.raises(AttributeError):
        _ = d.missing
    assert format_time(42) == "42s"
    assert format_time(3700).endswith("m 40s")
    obj = construct_class_by_name(class_name="collections.OrderedDict")
    assert obj == {}


def test_zoo_registry():
    # every reference artifact key is present (download_util.py:6-19)
    assert set(CHECKPOINT_URLS) == {
        "cifar10", "ffhq", "afhqv2", "imagenet64", "lsun_bedroom",
        "imagenet256", "imagenet256-classifier", "lsun_bedroom_ldm",
        "ffhq_ldm", "vq-f4", "ms_coco", "prompts"}
    with pytest.raises(KeyError):
        check_file_by_key("nope")
    assert MODEL_SPECS["imagenet64"][3] == 1000


def test_factory_archs():
    for name in ("cifar10", "ffhq", "imagenet64"):
        m = build_edm_model(name)
        assert m.img_resolution in (32, 64)
    assert EDM_ARCHS["afhqv2"] is EDM_ARCHS["ffhq"]


def test_image_io(tmp_path):
    imgs = (np.random.RandomState(0).rand(5, 8, 8, 3) * 255).astype(np.uint8)
    save_images(imgs, [0, 1, 2, 1000, 2048], str(tmp_path), subdirs=True)
    assert os.path.isfile(tmp_path / "000000" / "000002.png")
    assert os.path.isfile(tmp_path / "001000" / "001000.png")
    assert os.path.isfile(tmp_path / "002000" / "002048.png")
    save_grid(imgs, str(tmp_path / "grid.png"))
    assert os.path.isfile(tmp_path / "grid.png")
    assert parse_int_list("1,2,5-8") == [1, 2, 5, 6, 7, 8]


def test_profiling_helpers():
    params = {"a": {"w": np.zeros((3, 4))}, "b": np.zeros(7)}
    assert print_param_summary(params) == 19
    assert_shape(np.zeros((2, 3)), (2, None))
    with pytest.raises(AssertionError):
        assert_shape(np.zeros((2, 3)), (2, 4))
