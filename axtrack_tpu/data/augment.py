"""Whole-movie augmentation on device.

TPU-native counterpart of reference axtrack/data_utils.py:7-174. The
reference shifts sparse indices and chunks dense flips/rotations through
torchvision on 60-frame windows to fit memory; here the movie is dense on
HBM and each transform is one fused XLA op over [T, H, W].

Config semantics preserved exactly (data_utils.py:139-166): per-epoch
uniform draws per transform key; translate fires at u > .6 with
d = round(512*(u-.75)); flips fire at u > .6 ('hflip' flips the *y* axis and
'vflip' the *x* axis — the reference's naming, data_utils.py:154-159);
rotation fires at u > .6 with angle = u*40-20 degrees.

Rotation divergence (documented): the reference rotates images with
torchvision TF.rotate but anchors with its own center-(size+1)/2 formula
(data_utils.py:65-89) — two slightly different conventions. Here the image
is rotated with the exact forward map of the anchor formula (nearest
sampling), so images and labels agree by construction.
"""
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def draw_transform_config(use_transforms, rng):
    """dict key -> uniform draw, rounded to 3 decimals (data_utils.py:141)."""
    return {key: round(float(rng.random()), 3) for key in use_transforms}


def config_to_transform_params(transform_configs):
    """Map the random draws to (dy, dx, flip_y, flip_x, angle_deg)
    (data_utils.py:146-165)."""
    dy, dx = 0, 0
    if transform_configs.get('translateY', 0) > .6:
        dy = round(512 * (transform_configs.get('translateY', 0) - .75))
    if transform_configs.get('translateX', 0) > .6:
        dx = round(512 * (transform_configs.get('translateX', 0) - .75))
    flip_y = transform_configs.get('hflip', 0) > .6
    flip_x = transform_configs.get('vflip', 0) > .6
    angle = None
    if transform_configs.get('rot', 0) > .6:
        angle = transform_configs['rot'] * 40 - 20
    return dy, dx, flip_y, flip_x, angle


@partial(jax.jit, static_argnames=('dy', 'dx', 'flip_y', 'flip_x'))
def transform_frames(X, dy=0, dx=0, flip_y=False, flip_x=False, angle=0.0):
    """Apply translate -> flip -> rotate to [T, H, W] frames (the reference's
    order, data_utils.py:26-62). Zero fill outside."""
    T, H, W = X.shape
    if dy or dx:
        X = jnp.roll(X, (dy, dx), axis=(1, 2))
        ys = jnp.arange(H)
        xs = jnp.arange(W)
        yvalid = (ys - dy >= 0) & (ys - dy < H)
        xvalid = (xs - dx >= 0) & (xs - dx < W)
        X = jnp.where(yvalid[None, :, None] & xvalid[None, None, :], X, 0.0)
    if flip_y:
        X = jnp.flip(X, 1)
    if flip_x:
        X = jnp.flip(X, 2)

    def rotate(X):
        theta = angle * jnp.pi / 180.0
        y_mid = (H + 1) / 2.0
        x_mid = (W + 1) / 2.0
        yy = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
        xx = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
        # inverse of the anchor forward map (same formula, -theta)
        c, s = jnp.cos(-theta), jnp.sin(-theta)
        x_src = (xx - x_mid) * c + (yy - y_mid) * s + x_mid
        y_src = -(xx - x_mid) * s + (yy - y_mid) * c + y_mid
        xi = jnp.round(x_src).astype(jnp.int32)
        yi = jnp.round(y_src).astype(jnp.int32)
        ok = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        xi = jnp.clip(xi, 0, W - 1)
        yi = jnp.clip(yi, 0, H - 1)
        return jnp.where(ok[None], X[:, yi, xi], 0.0)

    return jax.lax.cond(jnp.float32(angle) != 0.0, rotate, lambda x: x, X)


def transform_frames_dynamic(X, dy, dx, flip_y, flip_x, angle):
    """transform_frames with TRACED parameters — same math, same results,
    but the augmentation draw is runtime data instead of compile-time
    constants. Used inside the fused chunk-resident big-movie program
    (train/bigmovie.py), where a per-epoch draw baked into the trace would
    recompile the whole chunk pipeline every epoch.

    Not separately jitted: callers trace it into their own program.
    """
    T, H, W = X.shape
    dy = jnp.asarray(dy, jnp.int32)
    dx = jnp.asarray(dx, jnp.int32)
    X = jnp.roll(X, (dy, dx), axis=(1, 2))
    ys = jnp.arange(H)
    xs = jnp.arange(W)
    yvalid = (ys - dy >= 0) & (ys - dy < H)
    xvalid = (xs - dx >= 0) & (xs - dx < W)
    X = jnp.where(yvalid[None, :, None] & xvalid[None, None, :], X, 0.0)
    X = jnp.where(flip_y, jnp.flip(X, 1), X)
    X = jnp.where(flip_x, jnp.flip(X, 2), X)

    angle = jnp.asarray(angle, jnp.float32)

    def rotate(X):
        theta = angle * jnp.pi / 180.0
        y_mid = (H + 1) / 2.0
        x_mid = (W + 1) / 2.0
        yy = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
        xx = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
        c, s = jnp.cos(-theta), jnp.sin(-theta)
        x_src = (xx - x_mid) * c + (yy - y_mid) * s + x_mid
        y_src = -(xx - x_mid) * s + (yy - y_mid) * c + y_mid
        xi = jnp.round(x_src).astype(jnp.int32)
        yi = jnp.round(y_src).astype(jnp.int32)
        ok = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        xi = jnp.clip(xi, 0, W - 1)
        yi = jnp.clip(yi, 0, H - 1)
        return jnp.where(ok[None], X[:, yi, xi], 0.0)

    return jax.lax.cond(angle != 0.0, rotate, lambda x: x, X)


def transform_anchors(target, angle, flip_y, flip_x, dy, dx, sizey, sizex):
    """Anchor transform on the label DataFrame — direct reimplementation of
    the reference's transform_Y (data_utils.py:64-137): translate (out of
    frame -> NaN), flip about mid=(size+1)/2, rotate with round + in-bounds
    drop."""
    target_transf = target.astype('float64')  # NaN marks dropped anchors
    if not len(target.columns):
        return target_transf
    y_anchor = target.loc[:, (slice(None), 'anchor_y')].astype('float64')
    x_anchor = target.loc[:, (slice(None), 'anchor_x')].astype('float64')

    if dy:
        y_anchor = y_anchor + dy
        y_anchor = y_anchor.where(~((y_anchor <= 1) | (y_anchor >= sizey - 1)))
    if dx:
        x_anchor = x_anchor + dx
        x_anchor = x_anchor.where(~((x_anchor <= 1) | (x_anchor >= sizex - 1)))

    y_mid = (sizey + 1) / 2.0
    x_mid = (sizex + 1) / 2.0
    if flip_y:
        y_anchor = y_mid + (y_mid - y_anchor)
    if flip_x:
        x_anchor = x_mid + (x_mid - x_anchor)

    if angle:
        theta = angle * np.pi / 180.0
        xa = x_anchor.values
        ya = y_anchor.values
        x_rot = np.round((xa - x_mid) * np.cos(theta)
                         + (ya - y_mid) * np.sin(theta) + x_mid)
        y_rot = np.round(-(xa - x_mid) * np.sin(theta)
                         + (ya - y_mid) * np.cos(theta) + y_mid)
        ok = (x_rot > 0) & (x_rot < sizex) & (y_rot > 0) & (y_rot < sizey)
        import pandas as pd
        x_anchor = pd.DataFrame(np.where(ok, x_rot, np.nan),
                                index=x_anchor.index, columns=x_anchor.columns)
        y_anchor = pd.DataFrame(np.where(ok, y_rot, np.nan),
                                index=y_anchor.index, columns=y_anchor.columns)

    target_transf.loc[:, (slice(None), 'anchor_y')] = np.round(y_anchor.values)
    target_transf.loc[:, (slice(None), 'anchor_x')] = np.round(x_anchor.values)
    return target_transf


def apply_transformations(transform_configs, X, target, sizey, sizex, rng):
    """Draw a fresh config and transform frames + anchors together
    (reference data_utils.py:139-174). X: jnp [T, H, W]; target: DataFrame."""
    transform_configs = draw_transform_config(transform_configs, rng)
    dy, dx, flip_y, flip_x, angle = config_to_transform_params(
        transform_configs)
    X = transform_frames(X, dy=dy, dx=dx, flip_y=flip_y, flip_x=flip_x,
                         angle=angle or 0.0)
    target = transform_anchors(target, angle, flip_y, flip_x, dy, dx,
                               sizey, sizex)
    return X, target, transform_configs
