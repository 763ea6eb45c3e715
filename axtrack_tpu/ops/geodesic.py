"""Batched masked geodesic distance transform.

TPU-native replacement for the reference's per-detection-pair C++ A* fan-out
(AxonDetections.py:526-585 + utils.py:351-390 + pyastar2d): one batched
kernel computes, for every source detection, the full geodesic distance map
over a window of the segmentation mask — one launch yields the whole
N_src x N_tgt distance matrix the reference builds pairwise on CPU threads.

Semantics contract (shared with the C++ oracle, native/astar.cpp):
4-connectivity, off-mask cells impassable, distance = steps; the reference's
"path length" is the node count = steps + 1 (AxonDetections.py:736 takes nnz
of the path matrix). Distances beyond ``max_dist`` steps are unreachable.

Algorithm: Gauss-Seidel chamfer sweeps. Each sweep scans rows forward then
backward (lax.scan); within a row, obstacle-respecting min-plus propagation
is a composition of functions s -> min(c, s+k), computed in O(log W) depth
with jax.lax.associative_scan over the (c, k) semigroup:
  (f2 . f1)(s) = min(c2, c1 + k2, s + k1 + k2).
Blocked cells contribute (inf, inf) and therefore absorb propagation —
unlike the classic cummin trick, distance cannot tunnel through walls.
Sweeps repeat until fixpoint (a sweep resolves one monotone "leg" of every
geodesic, so iterations ~ number of path direction reversals, small for
microchannel masks).
"""
import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

# np.float32 (NOT jnp): a module-level jnp constant would initialize the
# XLA backend at import time, which breaks jax.distributed.initialize()
# on pods (it must run before any backend init)
INF = np.float32(1e9)


def _row_relax(d_row, passable_row):
    """Obstacle-respecting horizontal min-plus relaxation of one row batch.

    d_row, passable_row: [..., W]. Returns elementwise-min of left-to-right
    and right-to-left propagation.
    """
    c = jnp.where(passable_row, d_row, INF)
    k = jnp.where(passable_row, jnp.float32(1.0), INF)

    def combine(a, b):
        ca, ka = a
        cb, kb = b
        return jnp.minimum(cb, ca + kb), jnp.minimum(ka + kb, INF)

    ax = c.ndim - 1
    cl, _ = jax.lax.associative_scan(combine, (c, k), axis=ax)
    cr, _ = jax.lax.associative_scan(combine, (c, k), axis=ax, reverse=True)
    return jnp.minimum(cl, cr)


def _sweep(d, passable):
    """One full chamfer iteration: top-down then bottom-up Gauss-Seidel row
    sweeps. d, passable: [H, W] (or leading batch dims folded into rows via
    vmap outside)."""
    def step(prev_row, rows):
        d_row, p_row = rows
        cand = jnp.minimum(d_row, prev_row + 1.0)
        new = _row_relax(cand, p_row)
        new = jnp.where(p_row, new, INF)
        return new, new

    init = jnp.full(d.shape[-1:], INF)
    _, down = jax.lax.scan(step, init, (d, passable))
    _, up = jax.lax.scan(step, init, (down[::-1], passable[::-1]))
    return up[::-1]


@partial(jax.jit, static_argnames=('max_sweeps',))
def _distance_map_from(passable, src_yx, max_sweeps=8):
    """Geodesic step-distance map [H, W] from one source on a static grid."""
    H, W = passable.shape
    # the source cell always seeds, even if off-mask (A* ignores the start
    # cell's weight — entering costs the *entered* cell's weight)
    p = passable.at[src_yx[0], src_yx[1]].set(True)
    d = jnp.full((H, W), INF).at[src_yx[0], src_yx[1]].set(0.0)

    def cond(state):
        d, prev, i = state
        return (i < max_sweeps) & jnp.any(d != prev)

    def body(state):
        d, _, i = state
        return _sweep(d, p), d, i + 1

    d = _sweep(d, p)
    d, _, _ = jax.lax.while_loop(cond, body, (d, jnp.full_like(d, -1.0), 1))
    return d


def use_pallas_backend():
    """True when geodesic kernels should use the Pallas/Mosaic path
    (TPU backend, overridable with AXTRACK_GEODESIC_BACKEND={pallas,lax})."""
    backend = os.environ.get('AXTRACK_GEODESIC_BACKEND')
    return (backend == 'pallas'
            or (backend is None and jax.default_backend() == 'tpu'))


def batched_windows(passable_padded, srcs_yx, window, max_sweeps=8,
                    converge=False):
    """Distance maps for N sources — dispatches to the Pallas kernel on TPU
    (geodesic_pallas.py) and the pure-lax implementation elsewhere. Both are
    parity-tested against the C++ oracle. Override with
    AXTRACK_GEODESIC_BACKEND={pallas,lax}.

    converge=True guarantees exactness regardless of mask geometry via the
    local-consistency certificate (geodesic_pallas._locally_consistent:
    the maps are upper bounds, so d <= min(4-neighbor d)+1 on passable
    cells proves optimality). The Pallas path doubles its sweep budget
    until certified; the lax path raises the while_loop bound (it already
    early-exits at fixpoint) and then CHECKS the certificate, doubling the
    bound on the rare geometry that needs more."""
    if use_pallas_backend():
        from .geodesic_pallas import (batched_windows_pallas,
                                      batched_windows_converged)
        if converge:
            return batched_windows_converged(passable_padded, srcs_yx,
                                             window, max_sweeps=max_sweeps)
        return batched_windows_pallas(passable_padded, srcs_yx, window,
                                      max_sweeps=max_sweeps)
    if not converge:
        return _batched_windows(passable_padded, srcs_yx, window,
                                max_sweeps)
    from .geodesic_pallas import (_pad_srcs, _crops_for,
                                  _locally_consistent)
    sweeps = max(max_sweeps, 2 * window)
    while True:
        dmaps, origins = _batched_windows(passable_padded, srcs_yx, window,
                                          sweeps)
        N, Np, orgs, local = _pad_srcs(passable_padded, srcs_yx, window)
        crops = _crops_for(passable_padded, orgs, local, window, Np)
        if bool(_locally_consistent(dmaps, crops[:N])):
            return dmaps, origins
        if sweeps >= 64 * window:
            import warnings
            warnings.warn(f'lax geodesic not certified exact after '
                          f'{sweeps} sweeps')
            return dmaps, origins
        sweeps *= 2


@partial(jax.jit, static_argnames=('window', 'max_sweeps'))
def _batched_windows(passable_padded, srcs_yx, window, max_sweeps):
    """Distance maps for N sources on per-source crops.

    passable_padded: bool[Hp, Wp] (pre-padded so any window fits).
    srcs_yx: i32[N, 2] source coords in padded frame coords.
    Returns (dmaps f32[N, window, window], origins i32[N, 2]).
    """
    Hp, Wp = passable_padded.shape

    def one(src):
        oy = jnp.clip(src[0] - window // 2, 0, Hp - window)
        ox = jnp.clip(src[1] - window // 2, 0, Wp - window)
        crop = jax.lax.dynamic_slice(passable_padded, (oy, ox),
                                     (window, window))
        local = jnp.stack([src[0] - oy, src[1] - ox])
        return _distance_map_from(crop, local, max_sweeps), jnp.stack([oy, ox])

    return jax.vmap(one)(srcs_yx)


def gather_targets(dmaps, origins, tgts_yx, max_dist, window):
    """Shape-bucketed wrapper around _gather_targets: pads the target count
    to a power of two (variable per-frame detection counts would otherwise
    recompile per shape). Padded targets use (-1,-1) -> outside window ->
    capped, then sliced away."""
    tgts = jnp.asarray(tgts_yx, jnp.int32).reshape(-1, 2)
    M = tgts.shape[0]
    Mp = 8
    while Mp < M:
        Mp *= 2
    tgts_p = jnp.pad(tgts, ((0, Mp - M), (0, 0)), constant_values=-10**6)
    out = _gather_targets(dmaps, origins, tgts_p, max_dist, window)
    return out[:, :M]


@partial(jax.jit, static_argnames=('window',))
def _gather_targets(dmaps, origins, tgts_yx, max_dist, window):
    """Read target distances from each source's window.

    Returns f32[N_src, N_tgt] node-count distances; ``max_dist`` marks
    unreachable (the reference caps at max_px_assoc_dist=500 and treats it
    as infinity downstream, mincostflow_models.py:103-118).
    """
    def per_src(dmap, origin):
        ly = tgts_yx[:, 0] - origin[0]
        lx = tgts_yx[:, 1] - origin[1]
        inside = (ly >= 0) & (ly < window) & (lx >= 0) & (lx < window)
        steps = dmap[jnp.clip(ly, 0, window - 1), jnp.clip(lx, 0, window - 1)]
        nodecount = steps + 1.0
        ok = inside & (nodecount <= max_dist)
        return jnp.where(ok, nodecount, max_dist)

    return jax.vmap(per_src)(dmaps, origins)


def geodesic_pairwise(mask, sources_yx, targets_yx, max_dist=500,
                      window=1024, max_sweeps=8):
    """All-pairs geodesic node-count distances between detections.

    Drop-in device-side equivalent of native.astar_pairwise, with
    unreachable encoded as ``max_dist`` (matching the reference's distance
    capping, AxonDetections.py:627-629 / 736).

    Exactness condition: ``window >= 2*max_dist + 1`` (any geodesic of
    <= max_dist steps stays within the source's L1 ball, which then fits the
    crop). A smaller window under-reports far distances as the cap — only
    acceptable when callers use a smaller effective association radius.

    Args:
      mask: bool[H, W] segmentation mask (True = passable).
      sources_yx, targets_yx: i32[N, 2] / i32[M, 2].
    Returns f32[N, M].
    """
    mask = jnp.asarray(mask, jnp.bool_)
    H, W = mask.shape
    window = min(window, max(_round_up(max(H, W), 8), 8))
    pad_h = max(window - H, 0)
    pad_w = max(window - W, 0)
    padded = jnp.pad(mask, ((0, pad_h), (0, pad_w)))
    srcs = jnp.asarray(sources_yx, jnp.int32).reshape(-1, 2)
    tgts = jnp.asarray(targets_yx, jnp.int32).reshape(-1, 2)
    dmaps, origins = batched_windows(padded, srcs, window, max_sweeps)
    return _gather_targets(dmaps, origins, tgts, jnp.float32(max_dist),
                           window)


def _round_up(x, m):
    return -(-x // m) * m
