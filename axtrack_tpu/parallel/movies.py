"""Multi-movie parallel inference across chips.

The reference processes one movie per process (SURVEY.md §2.3: no
distributed anything). On a TPU pod slice, independent timelapses are
embarrassingly parallel: this module shards a *batch of movies* over the
mesh 'data' axis — each chip runs the full detect pipeline on its movies,
XLA inserting no cross-chip traffic in the map (collectives only appear in
the shared-weight broadcast).

Movies must share a shape (pad/crop via data.prep.unify_timelapse); the
segmentation mask and detector weights are replicated.
"""
import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ..ops import preproc as PP
from ..ops import tiling as TL
from ..ops.decode import decode_tiled, distance_nms
from ..models.yolo import detect_axons


def batched_movie_detector(model, variables, mesh, params, n_frames,
                           tile_flat_idx, tile_yx, max_dets=256):
    """Build a jitted multi-movie detector.

    Returns fn(frames_u16 [M, T_all, H, W] uint16, mask [H, W]) ->
    (conf, x, y, alive) each [M, n_frames, max_dets], with the movie axis
    sharded over the mesh 'data' axis.
    """
    ts = params['TILESIZE']
    tc = params['TEMPORAL_CONTEXT']
    flat_idx = jnp.asarray(tile_flat_idx)
    tyx = jnp.asarray(tile_yx)
    centers = jnp.arange(tc, tc + n_frames, dtype=jnp.int32)
    clip = params['CLIP_LOWERLIM']
    nms_r = params['NON_MAX_SUPRESSION_DIST']

    def one_movie(fr_u16, m):
        x = fr_u16.astype(jnp.float32) / 65535.0
        _, std, _ = PP.nonzero_stats(x)
        proc = PP.preprocess_frames(x, m, 0.0, clip, jnp.mean(std))
        tiles = TL.tile_frames(proc, ts)
        T_all, ny, nx = tiles.shape[:3]
        flat_tiles = tiles.reshape(T_all, ny * nx, ts, ts)[:, flat_idx]

        def per_frame(t):
            Xc = jax.lax.dynamic_slice_in_dim(flat_tiles, t - tc,
                                              2 * tc + 1, axis=0)
            Xc = jnp.moveaxis(Xc, 0, -1)
            grid = detect_axons(model, variables, Xc)
            dets = decode_tiled(grid, tyx, 0.55, ts, max_dets=max_dets)
            alive = distance_nms(dets['conf'], dets['x'], dets['y'],
                                 dets['valid'], nms_r)
            return dets['conf'], dets['x'], dets['y'], alive

        return jax.lax.map(per_frame, centers)

    @jax.jit
    def detect_movies(frames_u16, mask):
        frames_u16 = jax.lax.with_sharding_constraint(
            frames_u16, NamedSharding(mesh, P('data')))
        return jax.vmap(one_movie, in_axes=(0, None))(frames_u16, mask)

    return detect_movies


def shard_movies(frames_u16, mesh):
    """Place a [M, ...] movie batch with M sharded over 'data'."""
    return jax.device_put(
        jnp.asarray(frames_u16), NamedSharding(mesh, P('data')))
