"""YOLO target construction from anchor labels.

Reimplements ``Timelapse.tiled_target2yolo_format`` (Timelapse.py:451-490)
as a jitted scatter over a fixed-size padded label set instead of the
reference's sparse-tensor trick (which existed to handle variable axon counts
— XLA handles that with validity masks).

Layout parity: the target grid is ``[T, ny, nx, Sx, Sy, 4]`` with dim -3
indexing the **x** grid cell (the reference's deliberate x/y dim swap,
Timelapse.py:453-489), channels = (conf, x_within, y_within, axon_id).
"""
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit,
         static_argnames=('ny', 'nx', 'Sy', 'Sx', 'tilesize', 'n_frames'))
def labels_to_yolo_grid(anchors_yx, axon_ids, t_idx, valid,
                        ny, nx, Sy, Sx, tilesize, n_frames):
    """Scatter anchor labels into the tiled YOLO target grid.

    Args:
      anchors_yx: f32[N, 2] (y, x) anchor coords in frame px.
      axon_ids: i32[N] axon identity of each anchor.
      t_idx: i32[N] frame index of each anchor.
      valid: bool[N] padding mask.
      n_frames: number of frames T (traced ok if concrete).

    Returns f32[T, ny, nx, Sx, Sy, 4].
    """
    y, x = anchors_yx[:, 0], anchors_yx[:, 1]
    ty = (y // tilesize).astype(jnp.int32)
    tx = (x // tilesize).astype(jnp.int32)
    y_in = y - ty * tilesize
    x_in = x - tx * tilesize
    # 0-1 wrt tile, then 0-S; int part = cell, frac part = within-cell
    # (Timelapse.py:457-483)
    yolo_y = y_in / tilesize * Sy
    yolo_x = x_in / tilesize * Sx
    cy = yolo_y.astype(jnp.int32)
    cx = yolo_x.astype(jnp.int32)
    wy = yolo_y - cy
    wx = yolo_x - cx

    grid = jnp.zeros((n_frames, ny, nx, Sx, Sy, 4), jnp.float32)
    vals = jnp.stack([jnp.ones_like(wx), wx, wy,
                      axon_ids.astype(jnp.float32)], -1)
    vals = jnp.where(valid[:, None], vals, 0.0)
    # drop out-of-range (padded) labels by pointing them off-grid
    t_safe = jnp.where(valid, t_idx, n_frames)
    return grid.at[t_safe, ty, tx, cx, cy].set(vals, mode='drop')


def frame_labels_from_dataframe(target_df, n_frames):
    """Flatten the reference's label DataFrame (rows=timepoints, columns
    MultiIndex (axon, {anchor_y, anchor_x}) — Timelapse.py:370-384) into
    padded arrays for ``labels_to_yolo_grid``.

    Returns (anchors_yx[N,2] f32, axon_ids[N] i32, t_idx[N] i32, valid[N]).
    """
    anchors, ids, ts = [], [], []
    if target_df is not None and len(target_df.columns):
        axon_names = list(target_df.columns.unique(0))
        for t in range(min(n_frames, len(target_df))):
            row = target_df.iloc[t]
            for a_i, name in enumerate(axon_names):
                try:
                    y = row[(name, 'anchor_y')]
                    x = row[(name, 'anchor_x')]
                except KeyError:
                    continue
                if y is None or x is None or np.isnan(y) or np.isnan(x):
                    continue
                anchors.append((float(y), float(x)))
                ids.append(a_i)
                ts.append(t)
    n = len(anchors)
    pad = max(n, 1)
    anchors_yx = np.zeros((pad, 2), np.float32)
    axon_ids = np.zeros(pad, np.int32)
    t_idx = np.zeros(pad, np.int32)
    valid = np.zeros(pad, bool)
    if n:
        anchors_yx[:n] = anchors
        axon_ids[:n] = ids
        t_idx[:n] = ts
        valid[:n] = True
    return anchors_yx, axon_ids, t_idx, valid
