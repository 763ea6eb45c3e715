"""Tiling ops: frame <-> tile-grid conversion.

TPU-native replacement for the reference's Python tile loops
(Timelapse.py:492-566 ``construct_tiles`` / 166-197 ``stitch_tiles``).
Tiles are produced by pad+reshape (one XLA op), not per-tile splits, and the
non-empty-tile mask becomes a gather index so the detector only sees occupied
tiles (mirrors Timelapse.py:551-559).
"""
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def n_tiles(size, tilesize):
    return -(-size // tilesize)


@partial(jax.jit, static_argnames=('tilesize',))
def tile_frames(frames, tilesize):
    """[..., H, W] -> [..., ny, nx, ts, ts], zero-padding the bottom/right
    edge tiles (reference pads with ZeroPad2d, Timelapse.py:524-528)."""
    *lead, H, W = frames.shape
    ny, nx = n_tiles(H, tilesize), n_tiles(W, tilesize)
    pad = [(0, 0)] * len(lead) + [(0, ny * tilesize - H), (0, nx * tilesize - W)]
    x = jnp.pad(frames, pad)
    x = x.reshape(*lead, ny, tilesize, nx, tilesize)
    # [..., ny, ts, nx, ts] -> [..., ny, nx, ts, ts]
    return jnp.moveaxis(x, -3, -2)


@partial(jax.jit, static_argnames=('H', 'W'))
def untile_frames(tiles, H, W):
    """Inverse of tile_frames: [..., ny, nx, ts, ts] -> [..., H, W]."""
    *lead, ny, nx, ts, _ = tiles.shape
    x = jnp.moveaxis(tiles, -2, -3).reshape(*lead, ny * ts, nx * ts)
    return x[..., :H, :W]


def nonempty_tile_mask(tiles):
    """[T, ny, nx, ts, ts] -> bool[ny, nx]: tile has any pixel > 0 in any
    frame (Timelapse.py:551-558 keeps tiles non-empty across timepoints)."""
    return np.asarray((tiles > 0).any(axis=(0, 3, 4)))


def tile_index_table(keep_mask):
    """Flat indices (into ny*nx) of kept tiles + their (ty, tx) coordinates.

    Returns (flat_idx[K], tile_yx[K, 2]) as numpy int32. Ordering is
    row-major over the tile grid, matching the reference's flat tile order
    (Timelapse.py:141-148 ``flat_tile_idx2yx_tile_idx``).
    """
    keep_mask = np.asarray(keep_mask)
    flat = np.flatnonzero(keep_mask.ravel()).astype(np.int32)
    ty, tx = np.divmod(flat, keep_mask.shape[1])
    return flat, np.stack([ty, tx], -1).astype(np.int32)


@partial(jax.jit, static_argnames=('temporal_context',))
def temporal_context_stack(frames_tiled, center_indices, temporal_context=2):
    """Build the per-frame detector input: each center frame is stacked with
    its +-temporal_context neighbors as channels (Timelapse.py:111-125).

    Args:
      frames_tiled: f32[T_all, K, ts, ts] tiles of all frames incl. context.
      center_indices: i32[T] index of each center frame in T_all.
    Returns f32[T, K, ts, ts, C] (NHWC, C = 2*temporal_context+1).
    """
    offs = jnp.arange(-temporal_context, temporal_context + 1)
    idx = center_indices[:, None] + offs[None, :]          # [T, C]
    x = frames_tiled[idx]                                  # [T, C, K, ts, ts]
    return jnp.moveaxis(x, 1, -1)                          # [T, K, ts, ts, C]
