"""End-to-end benchmark: reference-scale inference throughput on TPU.

Workload mirrors the reference's deployment shape (SURVEY.md §6): full-size
2920x6364 frames (exp_parameters.py:59), 512px tiles, the deployed CNN
architecture, YOLO decode + NMS, geodesic association distances, and the
min-cost-flow identity solve.

Baseline ("vs_baseline") is the reconstructed CPU reference pipeline — the
same stages the torch/CPU reference runs (AxonDetections.py:111-133 frame
loop + per-pair A*, here the native C++ Dijkstra equivalent), measured on
this host's CPU. The reference publishes no numbers (BASELINE.md), so this
re-measured CPU baseline is the comparison anchor.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import os
import sys
import time

import numpy as np


def build_workload(T=8, H=2920, W=6364, dets_per_frame=40, seed=0):
    from axtrack_tpu.data.synthetic import make_synthetic_timelapse
    frames, mask, labels = make_synthetic_timelapse(
        T=T + 4, H=H, W=W, n_axons=dets_per_frame, seed=seed,
        n_channels=max(4, dets_per_frame // 6), speed=(4, 14))
    return frames, mask, labels


def log(msg):
    print(f'# {msg}', file=sys.stderr, flush=True)


def tpu_pipeline(frames, mask, P, model, variables, n_frames):
    """Jitted TPU path: preproc -> tile -> CNN -> decode -> NMS per frame,
    then geodesic + MCF association. Returns (elapsed_s, per-stage dict).

    Each stage is ONE jitted program (per-op eager dispatch costs a
    compilation round-trip through the TPU tunnel)."""
    import jax
    import jax.numpy as jnp
    from functools import partial
    from axtrack_tpu.ops import preproc as PP, tiling as TL
    from axtrack_tpu.ops.decode import decode_tiled, distance_nms
    from axtrack_tpu.ops import geodesic as G
    from axtrack_tpu.models.yolo import detect_axons
    from axtrack_tpu.track import tracker

    ts = P['TILESIZE']
    # tile occupancy from the segmentation mask, host-side (static)
    ny, nx = TL.n_tiles(mask.shape[0], ts), TL.n_tiles(mask.shape[1], ts)
    mpad = np.zeros((ny * ts, nx * ts), bool)
    mpad[:mask.shape[0], :mask.shape[1]] = mask
    keep = mpad.reshape(ny, ts, nx, ts).any((1, 3))
    flat, tyx = TL.tile_index_table(keep)

    @partial(jax.jit, static_argnames=())
    def preproc_and_tile(x, m, flat_idx):
        var, _m_, _x_ = PP.nonzero_stats(x)
        var = jnp.mean(_m_)
        proc = PP.preprocess_frames(x, m, 0.0, 55 / 2 ** 16, var)
        tiles = TL.tile_frames(proc, ts)
        T_all = tiles.shape[0]
        return tiles.reshape(T_all, ny * nx, ts, ts)[:, flat_idx]

    t0 = time.perf_counter()
    flat_tiles = preproc_and_tile(jnp.asarray(frames), jnp.asarray(mask),
                                  jnp.asarray(flat))
    jax.block_until_ready(flat_tiles)
    t_preproc = time.perf_counter() - t0
    log(f'preproc+tile done in {t_preproc:.2f}s, '
        f'{flat_tiles.shape[1]} tiles/frame')

    tile_yx = jnp.asarray(tyx)

    @jax.jit
    def frame_step(flat_tiles, t):
        Xc = jax.lax.dynamic_slice_in_dim(flat_tiles, t - 2, 5, axis=0)
        Xc = jnp.moveaxis(Xc, 0, -1)
        grid = detect_axons(model, variables, Xc)
        # top-64 by conf: realistic detection density (the reference
        # workload tracks ~40 axons); random-weight nets would
        # otherwise saturate the cap and distort association load
        dets = decode_tiled(grid, tile_yx, 0.55, ts, max_dets=64)
        alive = distance_nms(dets['conf'], dets['x'], dets['y'],
                             dets['valid'], P['NON_MAX_SUPRESSION_DIST'])
        return dets, alive

    centers = list(range(2, 2 + n_frames))
    t0 = time.perf_counter()
    frame_dets = []
    for t in centers:
        dets, alive = frame_step(flat_tiles, t)
        keep_m = np.asarray(alive)
        frame_dets.append({
            'conf': np.asarray(dets['conf'])[keep_m].astype(np.float32),
            'x': np.asarray(dets['x'])[keep_m].astype(np.int32),
            'y': np.asarray(dets['y'])[keep_m].astype(np.int32)})
    t_detect = time.perf_counter() - t0
    log(f'detect done in {t_detect:.2f}s '
        f'({[len(d["conf"]) for d in frame_dets]} dets/frame)')

    # association: geodesic distances + MCF. Window 512 covers the
    # effective association radius at default MCF_EDGE_COST_THR=0.7
    # (d_eff ~ 252 px; farther edges are pruned by the tracker either way —
    # see detections._compute_detections_astar_dists).
    t0 = time.perf_counter()
    window = 512
    m = jnp.asarray(mask)
    Hp = max(window - m.shape[0], 0)
    Wp = max(window - m.shape[1], 0)
    padded = jnp.pad(m, ((0, Hp), (0, Wp)))
    use_pallas = jax.default_backend() == 'tpu'
    if use_pallas:
        from axtrack_tpu.ops.geodesic_pallas import batched_windows_pallas
    astar_dists = {}
    for s in range(n_frames - 1):
        if not len(frame_dets[s]['conf']):
            continue
        srcs = jnp.stack([jnp.asarray(frame_dets[s]['y']),
                          jnp.asarray(frame_dets[s]['x'])], -1)
        if use_pallas:
            dmaps, origins = batched_windows_pallas(padded, srcs, window, 6)
        else:
            dmaps, origins = G._batched_windows(padded, srcs, window, 6)
        for gap in (1, 2):
            t = s + gap
            if t >= n_frames or not len(frame_dets[t]['conf']):
                continue
            tgts = jnp.stack([jnp.asarray(frame_dets[t]['y']),
                              jnp.asarray(frame_dets[t]['x'])], -1)
            D = G._gather_targets(dmaps, origins, tgts, jnp.float32(500),
                                  window)
            astar_dists[(t, gap)] = np.asarray(D)
    t_geodesic = time.perf_counter() - t0
    log(f'geodesic done in {t_geodesic:.2f}s')

    t0 = time.perf_counter()
    mcf_params = {k: P[k] for k in P if k.startswith('MCF_')}
    mcf_params['MCF_MIN_FLOW'] = 1
    mcf_params['MCF_MAX_FLOW'] = 200
    result = tracker.assign_identities(frame_dets, astar_dists, mcf_params)
    t_mcf = time.perf_counter() - t0

    stages = {'preproc': t_preproc, 'detect': t_detect,
              'geodesic': t_geodesic, 'mcf': t_mcf}
    n_tracks = len(result.trajectories) if result else 0
    return sum(stages.values()), stages, n_tracks


def cpu_reference_pipeline(frames, mask, P, n_frames, dets_per_frame=40,
                           seed=0):
    """Reconstructed CPU reference path: numpy preproc chain
    (Timelapse.py:245-326), per-pair A* association distances
    (AxonDetections.py:526-585 via the C++ oracle), MCF solve. The CNN
    forward is measured separately on CPU via jax-cpu (the reference runs
    torch on CPU by default, config.py:13) and scaled to n_frames.
    Returns elapsed seconds (estimated for n_frames)."""
    from axtrack_tpu import native

    rng = np.random.default_rng(seed)
    # --- preproc, numpy per-frame like the reference
    t0 = time.perf_counter()
    x = frames.copy()
    x[:, ~mask] = 0
    x = np.where(x < 55 / 2 ** 16, 0, x)
    x = np.log2(1 + x)
    stds = [x[t][x[t] != 0].std() for t in range(x.shape[0])]
    x = x / np.mean(stds)
    t_preproc = time.perf_counter() - t0

    # --- A* per-pair distances (the reference's dominant CPU cost)
    dets = []
    ys, xs_ = np.where(mask)
    for t in range(n_frames):
        idx = rng.choice(len(ys), dets_per_frame, replace=False)
        dets.append(np.stack([ys[idx], xs_[idx]], -1).astype(np.int32))
    wts = np.where(mask, 1.0, 2.0 ** 16).astype(np.float32)
    t0 = time.perf_counter()
    pair_count = 0
    for s in range(n_frames - 1):
        for gap in (1, 2):
            t = s + gap
            if t >= n_frames:
                continue
            native.astar_pairwise(wts, dets[s], dets[t], 500)
            pair_count += 1
    t_astar = time.perf_counter() - t0
    return t_preproc + t_astar, {'preproc': t_preproc, 'astar': t_astar}


def cpu_cnn_time_per_frame(P, model_small_batch=4):
    """CPU CNN forward time for one full frame (78 tiles), measured on a
    small tile batch and scaled."""
    import jax
    import jax.numpy as jnp
    from axtrack_tpu.models.yolo import build_model, init_variables, \
        detect_axons
    cpu = jax.devices('cpu')[0]
    model = build_model(P)
    with jax.default_device(cpu):
        variables = init_variables(model, P, seed=0)
        X = jnp.zeros((model_small_batch, P['TILESIZE'], P['TILESIZE'], 5))
        fn = jax.jit(lambda X: detect_axons(model, variables, X))
        jax.block_until_ready(fn(X))            # compile
        t0 = time.perf_counter()
        jax.block_until_ready(fn(X))
        dt = time.perf_counter() - t0
    n_tiles_per_frame = 78
    return dt / model_small_batch * n_tiles_per_frame


def main():
    import jax
    # persistent compilation cache: compiles through the TPU tunnel are
    # slow (~20-60s/program); cache them across bench runs
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             '.jax_cache')
    try:
        jax.config.update('jax_compilation_cache_dir', cache_dir)
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    except Exception:
        pass
    from axtrack_tpu.params import get_default_parameters
    from axtrack_tpu.models.yolo import build_model, init_variables

    n_frames = int(os.environ.get('BENCH_FRAMES', 8))
    P = get_default_parameters()
    frames, mask, labels = build_workload(T=n_frames)

    model = build_model(P)
    variables = init_variables(model, P, seed=0)

    # warmup compile on a first pass, then measure
    log('pass 1 (compile)...')
    elapsed, stages, n_tracks = tpu_pipeline(frames, mask, P, model,
                                             variables, n_frames)
    log(f'pass 1 done in {elapsed:.1f}s; pass 2 (measure)...')
    elapsed, stages, n_tracks = tpu_pipeline(frames, mask, P, model,
                                             variables, n_frames)
    fps = n_frames / elapsed

    # CPU reference baseline
    log('cpu baseline...')
    cpu_elapsed, cpu_stages = cpu_reference_pipeline(
        frames, mask, P, n_frames=min(n_frames, 3))
    cpu_per_frame = cpu_elapsed / min(n_frames, 3)
    log(f'cpu preproc+astar: {cpu_per_frame:.2f}s/frame; cpu cnn...')
    cpu_per_frame += cpu_cnn_time_per_frame(P)
    cpu_fps = 1.0 / cpu_per_frame

    result = {
        'metric': 'e2e_inference_frames_per_sec',
        'value': round(fps, 3),
        'unit': 'frames/sec (2920x6364 px, detect+associate)',
        'vs_baseline': round(fps / cpu_fps, 2),
    }
    print(json.dumps(result))
    print(f'# stages (s): {stages}; tracks={n_tracks}; '
          f'cpu_baseline={cpu_fps:.3f} fps {cpu_stages}', file=sys.stderr)


if __name__ == '__main__':
    main()
