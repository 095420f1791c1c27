"""EDM augmentation pipeline (conditioning-label producing).

Rebuilds `amed-solver-main/training/augment.py:115-330` (vendored in the
reference, used by EDM-style training): pixel blitting (x/y flip, integer
rotation, integer translation), geometric transforms (isotropic/anisotropic
scale, fractional rotation/translation) and color transforms (brightness,
contrast, lumaflip, hue, saturation), each applied with probability p and
encoded into the conditioning label vector exactly as the reference (e.g.
the EDM augment_dim=9 layout: xflip, yflip, scale, rotate_frac x2, aniso x2,
translate_frac x2).

Simplification: the geometric warp uses direct bilinear resampling
(jax.scipy.ndimage.map_coordinates over a reflect-padded image) instead of
the reference's sym6-wavelet up/down-sampled grid_sample -- the label
semantics and transform parameters are identical; only the anti-aliasing
filter differs.

Functional API: augment_pipe(key, images_nhwc) -> (images, labels).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["AugmentPipe"]


def _rot2d(theta):
    c, s = jnp.cos(theta), jnp.sin(theta)
    z, o = jnp.zeros_like(theta), jnp.ones_like(theta)
    return jnp.stack([jnp.stack([c, -s, z], -1), jnp.stack([s, c, z], -1),
                      jnp.stack([z, z, o], -1)], -2)


def _scale2d(sx, sy):
    z, o = jnp.zeros_like(sx), jnp.ones_like(sx)
    return jnp.stack([jnp.stack([sx, z, z], -1), jnp.stack([z, sy, z], -1),
                      jnp.stack([z, z, o], -1)], -2)


def _translate2d(tx, ty):
    z, o = jnp.zeros_like(tx), jnp.ones_like(tx)
    return jnp.stack([jnp.stack([o, z, tx], -1), jnp.stack([z, o, ty], -1),
                      jnp.stack([z, z, o], -1)], -2)


@dataclasses.dataclass(frozen=True)
class AugmentPipe:
    """Probabilities multiply the overall p (augment.py:121-151)."""

    p: float = 1.0
    xflip: float = 0.0
    yflip: float = 0.0
    rotate_int: float = 0.0
    translate_int: float = 0.0
    translate_int_max: float = 0.125
    scale: float = 0.0
    rotate_frac: float = 0.0
    aniso: float = 0.0
    translate_frac: float = 0.0
    scale_std: float = 0.2
    rotate_frac_max: float = 1.0
    aniso_std: float = 0.2
    aniso_rotate_prob: float = 0.5
    translate_frac_std: float = 0.125
    brightness: float = 0.0
    contrast: float = 0.0
    lumaflip: float = 0.0
    hue: float = 0.0
    saturation: float = 0.0
    brightness_std: float = 0.2
    contrast_std: float = 0.5
    hue_max: float = 1.0
    saturation_std: float = 1.0

    @property
    def label_dim(self) -> int:
        d = 0
        d += 1 if self.xflip > 0 else 0
        d += 1 if self.yflip > 0 else 0
        d += 2 if self.rotate_int > 0 else 0
        d += 2 if self.translate_int > 0 else 0
        d += 1 if self.scale > 0 else 0
        d += 2 if self.rotate_frac > 0 else 0
        d += 2 if self.aniso > 0 else 0
        d += 2 if self.translate_frac > 0 else 0
        d += 1 if self.brightness > 0 else 0
        d += 1 if self.contrast > 0 else 0
        d += 1 if self.lumaflip > 0 else 0
        d += 2 if self.hue > 0 else 0
        d += 1 if self.saturation > 0 else 0
        return d

    def __call__(self, key, images) -> Tuple[jax.Array, jax.Array]:
        """images: [N, H, W, C] float. Returns (augmented, labels [N, D])."""
        n, h, w_, c = images.shape
        labels = []
        keys = iter(jax.random.split(key, 40))

        def gate(k, prob, values, zeros=None):
            zeros = jnp.zeros_like(values) if zeros is None else zeros
            mask = jax.random.uniform(k, (n,)) < prob * self.p
            shape = (n,) + (1,) * (values.ndim - 1)
            return jnp.where(mask.reshape(shape), values, zeros)

        # -- pixel blitting ---------------------------------------------
        if self.xflip > 0:
            wv = gate(next(keys), self.xflip,
                      jax.random.randint(next(keys), (n,), 0, 2).astype(jnp.float32))
            images = jnp.where(wv.reshape(-1, 1, 1, 1) == 1,
                               images[:, :, ::-1], images)
            labels.append(wv[:, None])
        if self.yflip > 0:
            wv = gate(next(keys), self.yflip,
                      jax.random.randint(next(keys), (n,), 0, 2).astype(jnp.float32))
            images = jnp.where(wv.reshape(-1, 1, 1, 1) == 1,
                               images[:, ::-1], images)
            labels.append(wv[:, None])
        if self.rotate_int > 0:
            wv = gate(next(keys), self.rotate_int,
                      jax.random.randint(next(keys), (n,), 0, 4).astype(jnp.float32))
            wb = wv.reshape(-1, 1, 1, 1)
            images = jnp.where((wb == 1) | (wb == 2), images[:, :, ::-1], images)
            images = jnp.where((wb == 2) | (wb == 3), images[:, ::-1], images)
            images = jnp.where((wb == 1) | (wb == 3),
                               jnp.swapaxes(images, 1, 2), images)
            labels += [(((wv == 1) | (wv == 2)).astype(jnp.float32))[:, None],
                       (((wv == 2) | (wv == 3)).astype(jnp.float32))[:, None]]
        if self.translate_int > 0:
            raw = jax.random.uniform(next(keys), (2, n)) * 2 - 1
            mask = (jax.random.uniform(next(keys), (1, n))
                    < self.translate_int * self.p)
            raw = jnp.where(mask, raw, 0.0)
            tx = jnp.round(raw[0] * w_ * self.translate_int_max).astype(jnp.int32)
            ty = jnp.round(raw[1] * h * self.translate_int_max).astype(jnp.int32)
            ygrid = jnp.arange(h)[None, :, None]
            xgrid = jnp.arange(w_)[None, None, :]
            # mirror-index arithmetic (augment.py:187-190)
            xi = (w_ - 1) - jnp.abs((w_ - 1) -
                                    (xgrid - tx[:, None, None]) % (2 * w_ - 2))
            yi = (h - 1) - jnp.abs((h - 1) -
                                   (ygrid + ty[:, None, None]) % (2 * h - 2))
            images = images[jnp.arange(n)[:, None, None], yi, xi]
            labels += [(tx / (w_ * self.translate_int_max))[:, None],
                       (ty / (h * self.translate_int_max))[:, None]]

        # -- geometric transforms ---------------------------------------
        g_inv = jnp.broadcast_to(jnp.eye(3), (n, 3, 3))
        geo = False
        if self.scale > 0:
            wv = gate(next(keys), self.scale, jax.random.normal(next(keys), (n,)))
            s = jnp.exp2(wv * self.scale_std)
            g_inv = g_inv @ _scale2d(1.0 / s, 1.0 / s)
            labels.append(wv[:, None])
            geo = True
        if self.rotate_frac > 0:
            wv = gate(next(keys), self.rotate_frac,
                      (jax.random.uniform(next(keys), (n,)) * 2 - 1)
                      * (np.pi * self.rotate_frac_max))
            g_inv = g_inv @ _rot2d(wv)  # rotate2d_inv(-w) == rotate2d(w)
            labels += [(jnp.cos(wv) - 1)[:, None], jnp.sin(wv)[:, None]]
            geo = True
        if self.aniso > 0:
            wv = gate(next(keys), self.aniso, jax.random.normal(next(keys), (n,)))
            r = (jax.random.uniform(next(keys), (n,)) * 2 - 1) * np.pi
            r = jnp.where(jax.random.uniform(next(keys), (n,))
                          < self.aniso_rotate_prob, r, 0.0)
            s = jnp.exp2(wv * self.aniso_std)
            g_inv = g_inv @ _rot2d(-r) @ _scale2d(1.0 / s, s) @ _rot2d(r)
            labels += [(wv * jnp.cos(r))[:, None], (wv * jnp.sin(r))[:, None]]
            geo = True
        if self.translate_frac > 0:
            raw = jax.random.normal(next(keys), (2, n))
            mask = (jax.random.uniform(next(keys), (1, n))
                    < self.translate_frac * self.p)
            raw = jnp.where(mask, raw, 0.0)
            g_inv = g_inv @ _translate2d(-raw[0] * w_ * self.translate_frac_std,
                                         -raw[1] * h * self.translate_frac_std)
            labels += [raw[0][:, None], raw[1][:, None]]
            geo = True

        if geo:
            images = _affine_warp(images, g_inv)

        # -- color transforms --------------------------------------------
        m = jnp.broadcast_to(jnp.eye(4), (n, 4, 4))
        luma = jnp.asarray([1.0, 1.0, 1.0, 0.0]) / np.sqrt(3.0)
        col = False
        if self.brightness > 0:
            wv = gate(next(keys), self.brightness,
                      jax.random.normal(next(keys), (n,)))
            b = wv * self.brightness_std
            t = jnp.broadcast_to(jnp.eye(4), (n, 4, 4))
            t = t.at[:, 0, 3].set(b).at[:, 1, 3].set(b).at[:, 2, 3].set(b)
            m = t @ m
            labels.append(wv[:, None])
            col = True
        if self.contrast > 0:
            wv = gate(next(keys), self.contrast,
                      jax.random.normal(next(keys), (n,)))
            cc = jnp.exp2(wv * self.contrast_std)
            diag = jnp.stack([cc, cc, cc, jnp.ones_like(cc)], -1)  # [n, 4]
            m = diag[:, :, None] * jnp.eye(4)[None] @ m
            labels.append(wv[:, None])
            col = True
        if self.lumaflip > 0:
            wv = gate(next(keys), self.lumaflip,
                      jax.random.randint(next(keys), (n,), 0, 2).astype(jnp.float32))
            outer = jnp.outer(luma, luma)
            m = (jnp.eye(4)[None] - 2.0 * outer[None] * wv[:, None, None]) @ m
            labels.append(wv[:, None])
            col = True
        if self.hue > 0:
            wv = gate(next(keys), self.hue,
                      (jax.random.uniform(next(keys), (n,)) * 2 - 1)
                      * (np.pi * self.hue_max))
            m = _rotate3d(luma[:3], wv) @ m
            labels += [(jnp.cos(wv) - 1)[:, None], jnp.sin(wv)[:, None]]
            col = True
        if self.saturation > 0:
            wv = gate(next(keys), self.saturation,
                      jax.random.normal(next(keys), (n,)))
            outer = jnp.outer(luma, luma)[None]
            m = (outer + (jnp.eye(4)[None] - outer)
                 * jnp.exp2(wv * self.saturation_std)[:, None, None]) @ m
            labels.append(wv[:, None])
            col = True

        if col:
            flat = images.reshape(n, h * w_, c)
            if c == 3:
                flat = jnp.einsum("nij,npj->npi", m[:, :3, :3], flat) + \
                    m[:, None, :3, 3]
            elif c == 1:
                mm = m[:, :3, :].mean(axis=1, keepdims=True)
                flat = flat * mm[:, :, :3].sum(-1)[:, :, None] + mm[:, :, 3:]
            else:
                raise ValueError("images must have 1 or 3 channels")
            images = flat.reshape(n, h, w_, c)

        if labels:
            label_vec = jnp.concatenate(labels, axis=1).astype(jnp.float32)
        else:
            label_vec = jnp.zeros((n, 0), jnp.float32)
        return images, label_vec


def _rotate3d(axis, theta):
    """Rodrigues rotation (4x4 homogeneous) around a unit 3-vector."""
    vx, vy, vz = axis[0], axis[1], axis[2]
    s, cth = jnp.sin(theta), jnp.cos(theta)
    cc = 1.0 - cth
    n = theta.shape[0]
    m = jnp.zeros((n, 4, 4))
    rows = [
        (vx * vx * cc + cth, vx * vy * cc - vz * s, vx * vz * cc + vy * s),
        (vy * vx * cc + vz * s, vy * vy * cc + cth, vy * vz * cc - vx * s),
        (vz * vx * cc - vy * s, vz * vy * cc + vx * s, vz * vz * cc + cth),
    ]
    for i, row in enumerate(rows):
        for j, v in enumerate(row):
            m = m.at[:, i, j].set(v)
    m = m.at[:, 3, 3].set(1.0)
    return m


def _affine_warp(images, g_inv):
    """Per-sample affine warp: output(p) = input(G_inv @ p), bilinear, with
    reflect padding (approximates the wavelet-filtered grid_sample)."""
    n, h, w_, c = images.shape
    cy, cx = (h - 1) / 2.0, (w_ - 1) / 2.0
    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32) - cy,
                          jnp.arange(w_, dtype=jnp.float32) - cx, indexing="ij")
    ones = jnp.ones_like(xs)
    grid = jnp.stack([xs, ys, ones], axis=0).reshape(3, -1)  # [3, H*W]

    def warp_sample(img, gi):
        src = gi @ grid
        sx = src[0] + cx
        sy = src[1] + cy

        def per_channel(ch2d):
            v = jax.scipy.ndimage.map_coordinates(ch2d, [sy, sx], order=1,
                                                  mode="reflect")
            return v.reshape(h, w_)

        return jnp.stack([per_channel(img[:, :, k]) for k in range(c)], axis=-1)

    return jax.vmap(warp_sample)(images, g_inv)
