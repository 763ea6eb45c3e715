"""Pallas TPU kernel for the masked geodesic distance transform.

Same algorithm as ops/geodesic.py (Gauss-Seidel chamfer sweeps with
obstacle-respecting min-plus row relaxation) but executed entirely in VMEM
by one Mosaic program per block of 8 sources — the pure-XLA version pays
per-op overhead on ~16k tiny row steps; in-kernel the row loop is tight VPU
code.

Row relaxation uses (c, k) function-composition doubling instead of
jax.lax.associative_scan: f(s) = min(c, s + k) composes as
  (f2 . f1) = (min(c2, c1 + k2), k1 + k2)
so log2(W) shift-and-combine steps compute the full obstacle-respecting
prefix relaxation in both directions. Blocked cells carry (inf, inf) and
absorb propagation. Semantics contract identical to native/astar.cpp and
ops/geodesic.py (parity-tested).

Layout: 8 sources per program -> row ops are [8, W] tiles (full VPU
sublanes). Mask crops travel as int8 (2.1MB at W=512) so crop + f32
distance map (8.4MB) fit VMEM together.
"""
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INF = 1e9  # plain float: pallas kernels cannot capture array constants
SRC_BLOCK = 8


def _row_relax(c, k, W):
    """Bidirectional obstacle-respecting min-plus relax of [B, W] rows."""
    col = jax.lax.broadcasted_iota(jnp.int32, c.shape, 1)

    def one_dir(c0, k0, from_left):
        cc, kk = c0, k0
        s = 1
        while s < W:
            if from_left:
                cs = pltpu.roll(cc, shift=s, axis=1)
                ks = pltpu.roll(kk, shift=s, axis=1)
                edge = col < s
            else:
                cs = pltpu.roll(cc, shift=W - s, axis=1)   # roll by -s
                ks = pltpu.roll(kk, shift=W - s, axis=1)
                edge = col >= W - s
            cs = jnp.where(edge, jnp.float32(INF), cs)
            ks = jnp.where(edge, jnp.float32(0.0), ks)
            cc = jnp.minimum(cc, cs + kk)
            kk = jnp.minimum(ks + kk, jnp.float32(INF))
            s *= 2
        return cc

    return jnp.minimum(one_dir(c, k, True), one_dir(c, k, False))


def _chamfer_kernel(src_ref, crop_ref, d_ref, *, window, max_sweeps):
    """One program: distance maps for SRC_BLOCK sources.

    src_ref: SMEM i32[N_total, 2] local (y, x) of every source (scalar
      prefetch; indexed by program).
    crop_ref: VMEM i8[SRC_BLOCK, W, W], 1 = passable.
    d_ref: VMEM f32[SRC_BLOCK, W, W] output (steps; INF unreachable).
    """
    W = window
    B = SRC_BLOCK
    prog = pl.program_id(0)

    yy = jax.lax.broadcasted_iota(jnp.int32, (B, W, W), 1)
    xx = jax.lax.broadcasted_iota(jnp.int32, (B, W, W), 2)
    sy = jnp.stack([src_ref[prog * B + b, 0] for b in range(B)]
                   ).reshape(B, 1, 1)
    sx = jnp.stack([src_ref[prog * B + b, 1] for b in range(B)]
                   ).reshape(B, 1, 1)
    is_src = (yy == sy) & (xx == sx)
    # source cell forced passable (A* ignores the start cell's weight —
    # see astar.cpp contract); d = 0 at sources, INF elsewhere
    passable = (crop_ref[:] > 0) | is_src
    crop_ref[:] = passable.astype(jnp.int8)
    d_ref[:] = jnp.where(is_src, jnp.float32(0.0), jnp.float32(INF))

    def sweep(_s, carry):
        def make_row_step(reverse):
            def row_step(i, prev):
                y = W - 1 - i if reverse else i
                d_row = d_ref[:, y, :]
                p_row = crop_ref[:, y, :] > 0
                cand = jnp.minimum(d_row, prev + 1.0)
                k = jnp.where(p_row, jnp.float32(1.0), jnp.float32(INF))
                c = jnp.where(p_row, cand, jnp.float32(INF))
                new = _row_relax(c, k, W)
                new = jnp.where(p_row, new, jnp.float32(INF))
                d_ref[:, y, :] = new
                return new
            return row_step

        init = jnp.full((B, W), INF, jnp.float32)
        jax.lax.fori_loop(0, W, make_row_step(False), init)
        jax.lax.fori_loop(0, W, make_row_step(True), init)
        return carry

    jax.lax.fori_loop(0, max_sweeps, sweep, jnp.int32(0))


@partial(jax.jit, static_argnames=('window', 'max_sweeps', 'interpret'))
def batched_windows_pallas(passable_padded, srcs_yx, window, max_sweeps=4,
                           interpret=False):
    """Pallas counterpart of geodesic._batched_windows.

    Returns (dmaps f32[N, window, window] in steps, origins i32[N, 2]).
    """
    Hp, Wp = passable_padded.shape
    srcs = jnp.asarray(srcs_yx, jnp.int32).reshape(-1, 2)
    N = srcs.shape[0]
    n_pad = -N % SRC_BLOCK
    srcs_p = jnp.pad(srcs, ((0, n_pad), (0, 0)))
    Np = srcs_p.shape[0]

    oy = jnp.clip(srcs_p[:, 0] - window // 2, 0, Hp - window)
    ox = jnp.clip(srcs_p[:, 1] - window // 2, 0, Wp - window)
    origins = jnp.stack([oy, ox], -1)
    local = srcs_p - origins

    p8 = passable_padded.astype(jnp.int8)
    crops = jax.vmap(lambda o: jax.lax.dynamic_slice(
        p8, (o[0], o[1]), (window, window)))(origins)

    grid = Np // SRC_BLOCK
    dmaps = pl.pallas_call(
        partial(_chamfer_kernel, window=window, max_sweeps=max_sweeps),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((SRC_BLOCK, window, window),
                             lambda i, s: (i, 0, 0)),
            ],
            out_specs=pl.BlockSpec((SRC_BLOCK, window, window),
                                   lambda i, s: (i, 0, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((Np, window, window), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(local, crops)
    return dmaps[:N], origins[:N]
