"""Detect-stage breakdown on the real chip (r4 next #2).

profile_cnn4.py showed the fused conv stack costs only ~19 ms per 8
full-size frames (42 TFLOP/s bf16, 1.6x off its layout-aware roofline)
— yet the whole detect stage measures ~5x that. This script times
cumulative sub-programs of bench.py's ``stage_det`` composition with
async-dispatch slope timing (the ~25 ms tunnel floor cancels) to
localize where the non-conv time goes:

  pre        u16 -> normalize -> preproc chain -> tile -> kept-tile gather
  conv       + 5-channel context stacks + the conv trunk (the stacks
               cannot be materialized standalone: a [...,5] program
               output lane-pads 5->128, a 25.6x buffer blowup XLA only
               avoids by fusing the stack into the conv)
  cnn        + FC head (= detect_axons)
  det(full)  + batched decode + distance-NMS   (== bench stage_det)

Each step is its own jitted program whose OUTPUT is the step's true
product (the next step consumes it in-program), so inter-step
materialization costs land on the step that causes them.

Run on TPU:  python scripts/profile_det_breakdown.py [n_frames] [dtype]
"""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')

from axtrack_tpu.params import get_default_parameters              # noqa
from axtrack_tpu.ops import preproc as PP, tiling as TL            # noqa
from axtrack_tpu.ops.decode import decode_tiled, distance_nms      # noqa
from axtrack_tpu.models.yolo import build_model, init_variables, \
    detect_axons                                                   # noqa
import bench                                                       # noqa


def timeit(fn, *args, reps=5):
    def run(m):
        out = fn(*args)
        for _ in range(m - 1):
            out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0].ravel()[:1])

    run(2)
    lo = hi = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        run(2)
        lo = min(lo, time.perf_counter() - t0)
        t0 = time.perf_counter()
        run(5)
        hi = min(hi, time.perf_counter() - t0)
    return (hi - lo) / 3


def main():
    n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    mode = sys.argv[2] if len(sys.argv) > 2 else 'mixed'
    P = get_default_parameters()
    frames, mask, _ = bench.build_workload(T=n_frames)
    dtype = jnp.bfloat16 if mode in ('bf16', 'mixed') else jnp.float32
    fc_dtype = jnp.float32 if mode == 'mixed' else None
    model = build_model(P, dtype=dtype, fc_dtype=fc_dtype)
    variables = init_variables(model, P, seed=0)

    ts = P['TILESIZE']
    MAXD = 64
    ny, nx = TL.n_tiles(mask.shape[0], ts), TL.n_tiles(mask.shape[1], ts)
    mpad = np.zeros((ny * ts, nx * ts), bool)
    mpad[:mask.shape[0], :mask.shape[1]] = mask
    keep = mpad.reshape(ny, ts, nx, ts).any((1, 3))
    flat, tyx = TL.tile_index_table(keep)
    frames_u16 = (np.clip(frames, 0, 1) * 65535).astype(np.uint16)
    centers = np.arange(2, 2 + n_frames, dtype=np.int32)
    DET_CHUNK = int(os.environ.get('BENCH_DET_CHUNK', 8))

    def _pre(fr_u16, m, flat_idx):
        x = fr_u16.astype(jnp.float32) / 65535.0
        _, std, _ = PP.nonzero_stats(x)
        proc = PP.preprocess_frames(x, m, 0.0, 55 / 2 ** 16, jnp.mean(std))
        tiles = TL.tile_frames(proc, ts)
        T_all = tiles.shape[0]
        return tiles.reshape(T_all, ny * nx, ts, ts)[:, flat_idx]

    def _stacks(flat_tiles):
        Xs_all = []
        for c0 in range(0, n_frames, DET_CHUNK):
            chunk = centers[c0:c0 + DET_CHUNK]
            Xs = [jnp.moveaxis(jax.lax.dynamic_slice_in_dim(
                      flat_tiles, int(t) - 2, 5, axis=0), 0, -1)
                  for t in chunk]
            Xs_all.append(jnp.concatenate(Xs, axis=0))
        return Xs_all

    # conv-only trunk: same layer shapes/dtypes as the model's conv stack
    # (BN-inference folds to an affine; weight VALUES don't affect timing)
    from flax import linen as nn
    rng = np.random.default_rng(0)
    trunk_ws = []
    cin = 5
    for spec in P['ARCHITECTURE'][0]:
        if spec == 'M':
            trunk_ws.append(None)
            continue
        k, cout, s, g = spec
        trunk_ws.append(
            (jnp.asarray(rng.normal(0, .1, (k, k, cin, cout)), dtype),
             jnp.asarray(rng.normal(0, 1, cout), dtype),
             jnp.asarray(1 + rng.random(cout), dtype), s))
        cin = cout

    def _conv_only(X):
        x = X.astype(dtype)
        for wbs in trunk_ws:
            if wbs is None:
                x = nn.max_pool(x, (2, 2), (2, 2))
                continue
            w, b, sc, s = wbs
            x = jax.lax.conv_general_dilated(
                x, w, (s, s), [(1, 1), (1, 1)],
                dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
            x = nn.leaky_relu(x * sc + b, negative_slope=0.1)
        return x

    def _pre16(fr_u16, m, flat_idx):
        # bf16 TILE STAGING: the preproc chain stays f32 (stats parity),
        # but the tile stack is stored bf16 — the exact value conv0 would
        # cast its input to anyway in mixed/bf16 mode, so detection
        # numerics are IDENTICAL; tile/stack HBM traffic halves.
        x = fr_u16.astype(jnp.float32) / 65535.0
        _, std, _ = PP.nonzero_stats(x)
        proc = PP.preprocess_frames(x, m, 0.0, 55 / 2 ** 16, jnp.mean(std))
        tiles = TL.tile_frames(proc.astype(dtype), ts)
        T_all = tiles.shape[0]
        return tiles.reshape(T_all, ny * nx, ts, ts)[:, flat_idx]

    steps = {}

    @jax.jit
    def p_pre(fr, m, fi):
        return _pre(fr, m, fi)
    steps['pre'] = p_pre

    @jax.jit
    def p_pre16(fr, m, fi):
        return _pre16(fr, m, fi)
    steps['pre16'] = p_pre16

    @jax.jit
    def p_conv16(fr, m, fi):
        return [_conv_only(X) for X in _stacks(_pre16(fr, m, fi))]
    steps['conv16'] = p_conv16

    def _trunk_prefix(X, n):
        x = X.astype(dtype)
        for wbs in trunk_ws[:n]:
            if wbs is None:
                x = nn.max_pool(x, (2, 2), (2, 2))
                continue
            w, b, sc, s = wbs
            x = jax.lax.conv_general_dilated(
                x, w, (s, s), [(1, 1), (1, 1)],
                dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
            x = nn.leaky_relu(x * sc + b, negative_slope=0.1)
        return x

    # thin prefix IN CONTEXT: stacks + conv0/conv1/conv2/pool3 — where
    # the isolated-layer table says the roofline gap lives
    @jax.jit
    def p_thin16(fr, m, fi):
        return [_trunk_prefix(X, 4) for X in _stacks(_pre16(fr, m, fi))]
    steps['thin16'] = p_thin16

    def _trunk_suffix(x, n):
        for wbs in trunk_ws[n:]:
            if wbs is None:
                x = nn.max_pool(x, (2, 2), (2, 2))
                continue
            w, b, sc, s = wbs
            x = jax.lax.conv_general_dilated(
                x, w, (s, s), [(1, 1), (1, 1)],
                dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
            x = nn.leaky_relu(x * sc + b, negative_slope=0.1)
        return x

    # conv0 as a 3D conv over (time, y, x): kernel [5,3,3], stride
    # (1,2,2) on the UN-DUPLICATED tile array — the moving 5-frame
    # context window IS the time dimension, so the 5x stack
    # materialization disappears; conv1.. proceed on the flattened
    # [T*K, 256,256,20] activations as before
    w0, b0, sc0, _ = trunk_ws[0]
    w0_3d = jnp.moveaxis(w0, 2, 0)[..., None, :]       # [5,3,3,1,20]

    @jax.jit
    def p_3d16(fr, m, fi):
        tiles = _pre16(fr, m, fi)                      # [T_all,K,512,512]
        x = jnp.moveaxis(tiles, 1, 0)[..., None]       # [K,T_all,512,512,1]
        y = jax.lax.conv_general_dilated(
            x, w0_3d, (1, 2, 2), [(0, 0), (1, 1), (1, 1)],
            dimension_numbers=('NDHWC', 'DHWIO', 'NDHWC'))
        y = nn.leaky_relu(y * sc0 + b0, negative_slope=0.1)
        # [K, T, 256, 256, 20] -> [T*K, 256, 256, 20]
        y = jnp.moveaxis(y, 1, 0).reshape(-1, 256, 256, 20)
        return _trunk_suffix(y, 1)
    steps['3d16'] = p_3d16

    # NCHW variant: stacks built channel-SECOND ([N,5,512,512] — minor
    # dims are clean 512s, no lane-pad pathology) and the trunk run with
    # NCHW dimension_numbers end to end
    def _stacks_nchw(flat_tiles):
        Xs_all = []
        for c0 in range(0, n_frames, DET_CHUNK):
            chunk = centers[c0:c0 + DET_CHUNK]
            Xs = [jax.lax.dynamic_slice_in_dim(flat_tiles, int(t) - 2, 5,
                                               axis=0)      # [5,K,ts,ts]
                  for t in chunk]
            Xs_all.append(jnp.concatenate(
                [jnp.moveaxis(X, 1, 0) for X in Xs], axis=0))
        return Xs_all                                        # [n*K,5,ts,ts]

    def _conv_only_nchw(x):
        for wbs in trunk_ws:
            if wbs is None:
                x = nn.max_pool(x.transpose(0, 2, 3, 1), (2, 2), (2, 2)
                                ).transpose(0, 3, 1, 2)
                continue
            w, b, sc, s = wbs
            x = jax.lax.conv_general_dilated(
                x, w, (s, s), [(1, 1), (1, 1)],
                dimension_numbers=('NCHW', 'HWIO', 'NCHW'))
            x = nn.leaky_relu(x * sc[None, :, None, None]
                              + b[None, :, None, None], negative_slope=0.1)
        return x

    @jax.jit
    def p_nchw16(fr, m, fi):
        return [_conv_only_nchw(X)
                for X in _stacks_nchw(_pre16(fr, m, fi))]
    if os.environ.get('PROFILE_NCHW'):
        # WARNING: the NCHW conv program's XLA compile ran >20 min on the
        # axon platform without completing (2026-08-20) — gated off so the
        # default run finishes; the hang is itself the measurement
        steps['nchw16'] = p_nchw16

    # the rest of the trunk, fed from a materialized [N,64,64,80] input
    n_total = n_frames * len(flat)
    act = jnp.zeros((n_total, 64, 64, 80), dtype)

    @jax.jit
    def p_rest16(a):
        return _trunk_suffix(a, 4)
    steps['rest16*'] = (p_rest16, (act,))

    @jax.jit
    def p_conv(fr, m, fi):
        return [_conv_only(X) for X in _stacks(_pre(fr, m, fi))]
    steps['conv'] = p_conv

    @jax.jit
    def p_cnn(fr, m, fi):
        return [detect_axons(model, variables, X)
                for X in _stacks(_pre(fr, m, fi))]
    steps['cnn'] = p_cnn

    K = len(flat)

    @jax.jit
    def p_full(fr, m, fi, tile_yx):
        grids_all = jnp.concatenate(
            [g.reshape(-1, K, *g.shape[1:])
             for g in [detect_axons(model, variables, X)
                       for X in _stacks(_pre(fr, m, fi))]])
        dec = jax.vmap(lambda g: decode_tiled(g, tile_yx, 0.55, ts,
                                              max_dets=MAXD))(grids_all)
        alive = jax.vmap(lambda c, xx, yy, v: distance_nms(
            c, xx, yy, v, P['NON_MAX_SUPRESSION_DIST']))(
                dec['conf'], dec['x'], dec['y'], dec['valid'])
        return dec['conf'], dec['x'], dec['y'], alive
    steps['det(full)'] = p_full

    fr_d, m_d, fi_d, tyx_d = (jax.device_put(a) for a in
                              (frames_u16, mask, flat, tyx))
    np.asarray(jax.tree.leaves([fr_d, m_d, fi_d, tyx_d])[0].ravel()[:1])

    print(f'# n_frames={n_frames} dtype={mode} K={K} tiles/frame, '
          f'DET_CHUNK={DET_CHUNK}, slope timing')
    prev = 0.0
    for name, fn in steps.items():
        if isinstance(fn, tuple):
            fn, args = fn
        else:
            args = ((fr_d, m_d, fi_d, tyx_d) if name == 'det(full)'
                    else (fr_d, m_d, fi_d))
        t = timeit(fn, *args) * 1e3
        print(f'{name:<10}{t:>9.1f} ms   (+{t - prev:.1f})')
        prev = t


if __name__ == '__main__':
    main()
