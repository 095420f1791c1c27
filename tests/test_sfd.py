"""SFD distillation trainer tests: teacher-slice alignment, loss decrease on
a learnable toy problem, AFS step skip, and data-parallel equivalence."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from diff_sampler_tpu.models import precond as P
from diff_sampler_tpu.ops import get_schedule
from diff_sampler_tpu.training.sfd import (SFDConfig, make_train_step,
                                           teacher_slice_indices)

RES, CH = 16, 3
KW = dict(model_channels=16, channel_mult=[1, 2], num_blocks=1,
          attn_resolutions=[8], dropout=0.0)


def test_teacher_slice_indices():
    # (M+1)*(num_steps-1)+1 fine points; knots at i*(M+1) (loss.py:96-97)
    assert teacher_slice_indices(4, 3) == [4, 8, 12]
    assert teacher_slice_indices(5, 1) == [2, 4, 6, 8]
    # fine-schedule knots coincide with the student schedule
    t_stu = get_schedule(4, 0.002, 80.0, "polynomial", 7.0)
    t_tea = get_schedule(13, 0.002, 80.0, "polynomial", 7.0)
    np.testing.assert_allclose(t_tea[[0, 4, 8, 12]], t_stu, rtol=1e-12)


def _setup(num_steps=3, M=1, afs=False):
    net = P.EDMPrecond(img_resolution=RES, img_channels=CH, label_dim=0,
                       model_type="SongUNet", model_kwargs=KW)
    params = net.init(jax.random.key(0), jnp.zeros((1, RES, RES, CH)),
                      jnp.ones((1,)))["params"]
    cfg = SFDConfig(num_steps=num_steps, M=M, afs=afs)
    opt = optax.adam(1e-4)
    step = make_train_step(net, cfg, opt)
    return net, params, opt, step


@pytest.mark.slow
def test_sfd_loss_decreases():
    net, params, opt, step = _setup()
    teacher = jax.tree.map(lambda a: a.copy(), params)
    # perturb the student so there is something to learn
    student = jax.tree.map(
        lambda a: a + 0.02 * jax.random.normal(jax.random.key(1), a.shape), params)
    opt_state = opt.init(student)
    jstep = jax.jit(step)
    lat = jax.random.normal(jax.random.key(2), (4, RES, RES, CH))
    losses = []
    for i in range(8):
        student, opt_state, m = jstep(student, opt_state, teacher, lat)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses


@pytest.mark.slow
def test_sfd_teacher_equals_student_zero_loss_first_step():
    """With student == teacher and the default dpmpp teacher at M=0 the fine
    trajectory IS the student euler?  Not in general -- but the loss must be
    small when the teacher solver is euler with M=0 (identical stepping)."""
    net = P.EDMPrecond(img_resolution=RES, img_channels=CH, label_dim=0,
                       model_type="SongUNet", model_kwargs=KW)
    params = net.init(jax.random.key(0), jnp.zeros((1, RES, RES, CH)),
                      jnp.ones((1,)))["params"]
    cfg = SFDConfig(num_steps=3, M=0, sampler_tea="euler")
    opt = optax.sgd(0.0)  # no-op updates: just measure the loss
    step = jax.jit(make_train_step(net, cfg, opt))
    lat = jax.random.normal(jax.random.key(2), (2, RES, RES, CH))
    _, _, m = step(params, opt.init(params), params, lat)
    per_step = np.asarray(m["loss_per_step"])
    # step 0 compares euler(student) vs euler(teacher) from the same state:
    # exactly zero.  Later steps accumulate drift through detached handoff.
    assert per_step[0] < 1e-4, per_step


@pytest.mark.slow
def test_sfd_afs_first_step_frozen():
    net, params, opt, step = _setup(afs=True)
    teacher = jax.tree.map(lambda a: a.copy(), params)
    opt_state = opt.init(params)
    p1, _, m = jax.jit(step)(params, opt_state, teacher,
                             jax.random.normal(jax.random.key(3), (2, RES, RES, CH)))
    assert np.isfinite(float(m["loss"]))


@pytest.mark.slow
def test_sfd_data_parallel_matches_single_device():
    from jax.sharding import NamedSharding, PartitionSpec as Pspec

    from diff_sampler_tpu.parallel import mesh as pm

    net, params, opt, step = _setup()
    teacher = jax.tree.map(lambda a: a.copy(), params)
    opt_state = opt.init(params)
    lat = jax.random.normal(jax.random.key(4), (8, RES, RES, CH))

    single = jax.jit(step)(params, opt_state, teacher, lat)

    mesh = pm.get_mesh()
    rep = NamedSharding(mesh, Pspec())
    shard = NamedSharding(mesh, Pspec("data", None, None, None))
    jstep = jax.jit(step, in_shardings=(rep, rep, rep, shard),
                    out_shardings=(rep, rep, rep))
    multi = jstep(jax.device_put(params, rep), jax.device_put(opt_state, rep),
                  jax.device_put(teacher, rep), jax.device_put(lat, shard))
    np.testing.assert_allclose(float(single[2]["loss"]), float(multi[2]["loss"]),
                               rtol=1e-5)
    diffs = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                         single[0], multi[0])
    assert max(jax.tree.leaves(diffs)) < 1e-5
