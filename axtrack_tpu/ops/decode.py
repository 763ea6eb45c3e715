"""YOLO-grid decode, fused with tile->frame stitching.

Reimplements the reference's decode chain (AxonDetections.py:178-248
``_yolo_Y2pandas_det`` + Timelapse.py:166-197 ``stitch_tiles``) as one jitted
op: grid-cell offset + rescale + rounding + confidence filter + tile-offset
addition, emitting a fixed-size top-K detection set (XLA needs static shapes;
variable detection counts are handled with validity masks).

Grid layout note: the reference reshapes model output to
``[ntiles, Sx, Sy, 3]`` (model.py:123) where dim 1 indexes the x grid cell
and dim 2 the y grid cell (AxonDetections.py:197-207); preserved here.
"""
from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=('tilesize', 'max_dets'))
def decode_tiled(grids, tile_yx, conf_thr, tilesize, max_dets=512):
    """Decode tiled YOLO grids into frame-coordinate detections.

    Args:
      grids: f32[K, Sx, Sy, C] with C>=3: (conf, x_within, y_within[, id]).
      tile_yx: i32[K, 2] (tile_y, tile_x) grid coordinate of each tile.
      conf_thr: detections kept when conf >= conf_thr
        (AxonDetections.py:220).
      tilesize: tile edge in px.
      max_dets: static output size; top-``max_dets`` by confidence.

    Returns dict of f32/i32[max_dets]: conf, x, y, ids, valid — sorted by
    descending confidence (ties broken by tile-major cell order).
    """
    K, Sx, Sy, C = grids.shape
    conf = grids[..., 0]
    gx = jax.lax.broadcasted_iota(jnp.float32, (K, Sx, Sy), 1)
    gy = jax.lax.broadcasted_iota(jnp.float32, (K, Sx, Sy), 2)
    # within-cell (0-1) + cell index, scaled to px, rounded
    # (AxonDetections.py:200-207)
    x = jnp.round((grids[..., 1] + gx) * (tilesize / Sx))
    y = jnp.round((grids[..., 2] + gy) * (tilesize / Sy))
    # fused stitch: add tile offsets (Timelapse.py:190-192)
    x = x + tile_yx[:, None, None, 1] * tilesize
    y = y + tile_yx[:, None, None, 0] * tilesize
    ids = grids[..., 3] if C > 3 else jnp.zeros_like(conf)

    conf, x, y, ids = (a.reshape(-1) for a in (conf, x, y, ids))
    valid = conf >= conf_thr
    score = jnp.where(valid, conf, -jnp.inf)
    k = min(max_dets, score.shape[0])
    top_score, top_idx = jax.lax.top_k(score, k)
    pad = max_dets - k
    if pad:
        top_idx = jnp.pad(top_idx, (0, pad))
        top_score = jnp.pad(top_score, (0, pad), constant_values=-jnp.inf)
    return {
        'conf': conf[top_idx],
        'x': x[top_idx],
        'y': y[top_idx],
        'ids': ids[top_idx].astype(jnp.int32),
        'valid': jnp.isfinite(top_score),
    }


@jax.jit
def distance_nms(conf, x, y, valid, radius):
    """Greedy confidence-ordered distance NMS.

    Matches the reference's sequential suppression semantics
    (AxonDetections.py:250-278): sort by descending confidence, then each
    surviving detection kills all strictly-lower-ranked detections within
    ``dist < radius``. Coordinates are integers post-decode, so the strict
    ``<`` comparison is done on squared integer distances for exactness.

    Inputs must already be sorted by descending conf (decode_tiled output).
    Returns the updated validity mask.

    Implementation: parallel Jacobi fixpoint instead of an n-step
    sequential loop. The greedy result is the unique fixpoint of
      alive[i] = valid[i] & ~any(j < i, alive[j], d2[j,i] < r2),
    and iterating that update stabilizes prefix 0..k after k rounds, so
    the while_loop is exact and terminates in <= n rounds — in practice
    suppression-chain depth (a handful). Each round is one [n, n]
    masked-any, which vectorizes on the VPU; at n=1024 the old fori_loop
    ran 1024 dependent scalar-indexed steps inside the fused program.
    """
    n = conf.shape[0]
    # integer d2 vs CEIL(r^2): dist < radius <=> d2 < ceil(r^2) for integer
    # d2 (round() would miss e.g. r=3.5: round(12.25)=12 excludes d2=12,
    # dist ~3.464 < 3.5; ceil keeps the comparison exact for fractional
    # radii and is identical for integer ones)
    r2 = jnp.ceil(jnp.asarray(radius, jnp.float32) ** 2).astype(jnp.int32)
    xi = x.astype(jnp.int32)
    yi = y.astype(jnp.int32)
    pos = jnp.arange(n)
    # may_kill[j, i]: a surviving j would suppress i (strictly lower rank)
    d2 = (xi[:, None] - xi[None, :]) ** 2 + (yi[:, None] - yi[None, :]) ** 2
    may_kill = (d2 < r2) & (pos[:, None] < pos[None, :])

    def cond(state):
        alive, prev, it = state
        return (it < n) & jnp.any(alive != prev)

    def body(state):
        alive, _, it = state
        killed = jnp.any(may_kill & alive[:, None], axis=0)
        return valid & ~killed, alive, it + 1

    alive, _, _ = jax.lax.while_loop(
        cond, body, (valid, jnp.zeros_like(valid), jnp.int32(0)))
    return alive
