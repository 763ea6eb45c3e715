"""Augmentation tests: image and anchor transforms stay consistent."""
import numpy as np
import pandas as pd
import jax.numpy as jnp
import pytest

from axtrack_tpu.data.augment import (transform_frames, transform_anchors,
                                      config_to_transform_params,
                                      apply_transformations)


def make_target(points):
    """points: dict axon -> list of (y, x) per frame."""
    cols = pd.MultiIndex.from_product(
        [sorted(points), ['anchor_y', 'anchor_x']], names=('axon', 'prop'))
    T = len(next(iter(points.values())))
    df = pd.DataFrame(index=range(T), columns=cols, dtype=float)
    for name, track in points.items():
        df[(name, 'anchor_y')] = [p[0] for p in track]
        df[(name, 'anchor_x')] = [p[1] for p in track]
    return df


class TestTransformParams:
    def test_thresholds(self):
        # u <= .6 -> no-op for every transform (data_utils.py:149-164)
        dy, dx, fy, fx, ang = config_to_transform_params(
            {'translateY': .5, 'translateX': .6, 'hflip': .6, 'vflip': .1,
             'rot': .59})
        assert (dy, dx, fy, fx, ang) == (0, 0, False, False, None)

    def test_translate_magnitude(self):
        dy, dx, *_ = config_to_transform_params(
            {'translateY': 1.0, 'translateX': .7})
        assert dy == round(512 * .25) == 128
        assert dx == round(512 * -.05) == -26

    def test_rot_range(self):
        *_, ang = config_to_transform_params({'rot': 1.0})
        assert ang == 20.0
        *_, ang = config_to_transform_params({'rot': .61})
        assert abs(ang - 4.4) < 1e-9


class TestFrames:
    def test_translate_zero_fill(self):
        X = jnp.ones((2, 16, 16))
        out = np.asarray(transform_frames(X, dy=4, dx=-3))
        assert out[0, :4, :].sum() == 0          # rows shifted down
        assert out[0, :, -3:].sum() == 0         # cols shifted left
        assert out[0, 4:, :-3].min() == 1.0

    def test_flips(self):
        X = jnp.asarray(np.arange(16, dtype=np.float32).reshape(1, 4, 4))
        fy = np.asarray(transform_frames(X, flip_y=True))
        np.testing.assert_array_equal(fy[0], np.asarray(X[0])[::-1])
        fx = np.asarray(transform_frames(X, flip_x=True))
        np.testing.assert_array_equal(fx[0], np.asarray(X[0])[:, ::-1])

    def test_rotation_moves_pixel_to_anchor_position(self):
        """The image forward map must agree with the anchor formula: a
        bright pixel at the anchor lands at the transformed anchor."""
        H = W = 101
        y0, x0 = 30, 70
        X = np.zeros((1, H, W), np.float32)
        X[0, y0, x0] = 1.0
        angle = 17.0
        out = np.asarray(transform_frames(jnp.asarray(X), angle=angle))
        target = make_target({'Axon_000': [(y0, x0)]})
        t2 = transform_anchors(target, angle, False, False, 0, 0, H, W)
        ny = t2[('Axon_000', 'anchor_y')].iloc[0]
        nx = t2[('Axon_000', 'anchor_x')].iloc[0]
        ys, xs = np.nonzero(out[0])
        # nearest-sampling: the bright pixel appears within 1 px of the
        # transformed anchor
        d = np.hypot(ys - ny, xs - nx).min()
        assert d <= 1.5, (ny, nx, ys, xs)


class TestAnchors:
    def test_translate_and_oob(self):
        target = make_target({'A': [(10, 10)], 'B': [(250, 250)]})
        out = transform_anchors(target, None, False, False, dy=-9, dx=0,
                                sizey=256, sizex=256)
        # A's y = 1 -> dropped (reference drops y <= 1, data_utils.py:112)
        assert np.isnan(out[('A', 'anchor_y')].iloc[0])
        assert out[('B', 'anchor_y')].iloc[0] == 241

    def test_flip_formula(self):
        target = make_target({'A': [(10, 30)]})
        out = transform_anchors(target, None, True, True, 0, 0, 100, 100)
        mid = (100 + 1) / 2
        assert out[('A', 'anchor_y')].iloc[0] == round(mid + (mid - 10))
        assert out[('A', 'anchor_x')].iloc[0] == round(mid + (mid - 30))


class TestApply:
    def test_apply_transformations_draws_and_applies(self):
        rng = np.random.default_rng(0)
        X = jnp.asarray(rng.random((3, 64, 64), np.float32))
        target = make_target({'A': [(20, 20), (21, 22), (22, 24)]})
        X2, t2, cfg = apply_transformations(
            dict.fromkeys(['vflip', 'hflip', 'rot', 'translateY',
                           'translateX'], 0), X, target, 64, 64, rng)
        assert X2.shape == X.shape
        assert set(cfg) == {'vflip', 'hflip', 'rot', 'translateY',
                            'translateX'}
