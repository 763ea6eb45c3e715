"""Production-API breakdown: where detect_dataset/assign_ids time goes
at 20 frames (scripts/bench_production.py measured 37.4 fps vs the
hand-built stages' 61.7 — this localizes the gap).

Pieces, slope-timed on device where applicable:
  chunk16      the n_centers=16 fused chunk program (conv batches 11+5)
  chunk4       the n_centers=4 trailing chunk program
  eager        the chained association program (window chamfer + gathers)
  detect wall  detect_dataset() wall time (incl. host assembly)
  assign wall  assign_ids() wall time (incl. packed fetch, MCF, pandas)
plus a cProfile of the host side of both calls (top cumulative).

Run on TPU:  BENCH_FRAMES=20 python scripts/profile_production.py
"""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import cProfile
import pstats
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), '.jax_cache')
    jax.config.update('jax_compilation_cache_dir', cache_dir)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

    from axtrack_tpu.data.synthetic import write_fixture
    from axtrack_tpu.data.timelapse import Timelapse
    from axtrack_tpu.detections import AxonDetections, _chunk_program, \
        MAX_DETS_PER_FRAME
    import axtrack_tpu as axtrack
    import tempfile

    n_frames = int(os.environ.get('BENCH_FRAMES', 20))
    fxdir = os.path.join(cache_dir, f'prod_fixture_{n_frames}')
    if not os.path.exists(os.path.join(fxdir, 'movie.tif')):
        os.makedirs(fxdir, exist_ok=True)
        write_fixture(fxdir, name='movie', T=n_frames + 4, H=2920, W=6364,
                      n_axons=40, seed=0, n_channels=8)

    P, (model, variables), scaler = axtrack.setup_inference(
        tempfile.mkdtemp(prefix='prod_prof_'), precision='mixed')
    P['MCF_MIN_FLOW'] = 1
    P['MCF_MAX_FLOW'] = 200

    tl = Timelapse(
        imseq_path=os.path.join(fxdir, 'movie.tif'), labels_csv=None,
        mask_path=os.path.join(fxdir, 'movie_mask.npy'),
        timepoints=None, offset=None, log_correct=True,
        standardize_framewise=False, standardize=scaler,
        name='prod_bench', use_transforms=[], contrast_llim=55,
        plot=False, pad=None, Sy=P['SY'], Sx=P['SX'],
        tilesize=P['TILESIZE'], cache=None, from_cache=None,
        temporal_context=P['TEMPORAL_CONTEXT'])

    ax = AxonDetections((model, variables), tl, P, directory=None)
    # warm everything once (compiles + tile construction)
    ax.detect_dataset()
    ax.assign_ids()

    def slope(fn, *args, reps=5, hi_m=6):
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
            run(hi_m)
            hi = min(hi, time.perf_counter() - t0)
        return (hi - lo) / (hi_m - 2)

    ds = tl
    tc = ds.temporal_context
    tile_yx = jnp.asarray(ds._tile_yx)
    conf_thr = float(ax.all_conf_thrs.min())
    K = len(ds._tile_flat_idx)
    act_bytes = K * ax.tilesize ** 2 * (2 * tc + 1) * 4
    batch_frames = int(min(16, max(1, (4 * 2 ** 30) // act_bytes)))
    print(f'# K={K} tiles/frame, batch_frames={batch_frames}, '
          f'MAX_DETS={MAX_DETS_PER_FRAME}')

    subset = ax.timepoint_subset
    for c0 in range(0, len(subset), 16):
        chunk = subset[c0:c0 + 16]
        t_all = [ds.timepoints_indices[t] for t in chunk]
        lo_, hi_ = min(t_all) - tc, max(t_all) + tc + 1
        tiles_chunk = jnp.asarray(ds.X_tiled[lo_:hi_])
        centers = jnp.asarray([t - lo_ for t in t_all], jnp.int32)
        step = _chunk_program(model, ax.tilesize, tc, batch_frames,
                              MAX_DETS_PER_FRAME)
        t = slope(step, variables, tiles_chunk, centers, tile_yx,
                  conf_thr, ax.nms_min_dist, len(t_all)) * 1e3
        print(f'chunk{len(t_all):<3} device: {t:8.1f} ms')

    # the eager association program on the real detection handles
    eager = ax._eager_assoc
    if eager is None:
        ax.detect_dataset()
        eager = ax._eager_assoc
    from axtrack_tpu.detections import _eager_assoc_program
    run_p, _, _ = _eager_assoc_program(
        eager['window'], eager['maxd'], eager['T'], eager['n_pairs'],
        float(ax.max_px_assoc_dist), eager['budget'], eager['backend'],
        MAX_DETS_PER_FRAME, eager['max_gap'])
    t = slope(run_p, eager['padded'], eager['dets'], hi_m=4) * 1e3
    print(f'eager assoc device: {t:8.1f} ms')

    # wall times + host profile
    for name, fn in (('detect_dataset', lambda: ax.detect_dataset()),
                     ('assign_ids', lambda: ax.assign_ids())):
        t0 = time.perf_counter()
        fn()
        print(f'{name} wall: {(time.perf_counter() - t0) * 1e3:8.1f} ms')

    pr = cProfile.Profile()
    pr.enable()
    ax.detect_dataset()
    ax.assign_ids()
    pr.disable()
    st = pstats.Stats(pr)
    st.sort_stats('cumulative')
    print('# host profile (top 25 cumulative):')
    st.print_stats(25)


if __name__ == '__main__':
    main()
