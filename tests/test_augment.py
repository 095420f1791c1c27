"""AugmentPipe behavior tests: label layout, identity at p=0, exact blits."""

import numpy as np

import jax
import jax.numpy as jnp

from diff_sampler_tpu.ops.augment import AugmentPipe


def test_edm_label_layout():
    pipe = AugmentPipe(p=0.12, xflip=1e8, yflip=1, scale=1, rotate_frac=1,
                       aniso=1, translate_frac=1)
    assert pipe.label_dim == 9  # EDM augment_dim=9
    imgs = jax.random.normal(jax.random.key(0), (4, 16, 16, 3))
    out, labels = jax.jit(pipe.__call__)(jax.random.key(1), imgs)
    assert out.shape == imgs.shape and labels.shape == (4, 9)
    assert bool(jnp.isfinite(out).all())


def test_identity_at_p_zero():
    pipe = AugmentPipe(p=0.0, xflip=1, yflip=1, rotate_int=1, translate_int=1,
                       scale=1, rotate_frac=1, aniso=1, translate_frac=1,
                       brightness=1, contrast=1, lumaflip=1, hue=1, saturation=1)
    imgs = jax.random.normal(jax.random.key(2), (3, 8, 8, 3))
    out, labels = pipe(jax.random.key(3), imgs)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(imgs))
    assert bool((labels == 0).all())


def test_xflip_exact():
    pipe = AugmentPipe(p=1.0, xflip=1.0)
    imgs = jax.random.normal(jax.random.key(4), (6, 8, 8, 3))
    out, labels = pipe(jax.random.key(5), imgs)
    for i in range(6):
        target = imgs[i, :, ::-1] if labels[i, 0] == 1 else imgs[i]
        assert float(jnp.abs(out[i] - target).max()) == 0.0
    # both branches exercised with overwhelming probability
    assert 0 < float(labels[:, 0].sum()) < 6


def test_color_transforms_finite_and_labeled():
    pipe = AugmentPipe(p=1.0, brightness=1, contrast=1, lumaflip=1, hue=1,
                       saturation=1)
    assert pipe.label_dim == 6
    imgs = jax.random.normal(jax.random.key(6), (4, 8, 8, 3))
    out, labels = pipe(jax.random.key(7), imgs)
    assert labels.shape == (4, 6)
    assert bool(jnp.isfinite(out).all())
    assert float(jnp.abs(out - imgs).max()) > 0  # something happened
