"""Break down the production-API assign_ids wall-clock: dets-array prep,
each astar-dists flush (maps launch + packed gather fetch), MCF solve,
aggregation. Drives the same workload as scripts/bench_production.py.
"""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import numpy as np


def main():
    import jax
    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), '.jax_cache')
    jax.config.update('jax_compilation_cache_dir', cache_dir)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

    from axtrack_tpu.data.timelapse import Timelapse
    from axtrack_tpu.detections import AxonDetections
    import axtrack_tpu as axtrack
    import tempfile

    n_frames = int(os.environ.get('BENCH_FRAMES', 8))
    fxdir = os.path.join(cache_dir, f'prod_fixture_{n_frames}')
    P, (model, variables), scaler = axtrack.setup_inference(
        tempfile.mkdtemp(prefix='prod_prof_'))
    P['MCF_MIN_FLOW'] = 1
    P['MCF_MAX_FLOW'] = 200

    tl = Timelapse(
        imseq_path=os.path.join(fxdir, 'movie.tif'),
        labels_csv=None,
        mask_path=os.path.join(fxdir, 'movie_mask.npy'),
        timepoints=None, offset=None, log_correct=True,
        standardize_framewise=False, standardize=scaler,
        name='prod_prof', use_transforms=[], contrast_llim=55,
        plot=False, pad=None, Sy=P['SY'], Sx=P['SX'],
        tilesize=P['TILESIZE'], cache=None, from_cache=None,
        temporal_context=P['TEMPORAL_CONTEXT'])

    ax = AxonDetections((model, variables), tl, P, directory=None)
    ax.detect_dataset()

    for rep in range(3):
        print(f'--- rep {rep} ---', flush=True)
        t0 = time.perf_counter()
        dets = ax._frame_det_arrays()
        t1 = time.perf_counter()
        print(f'dets arrays: {t1 - t0:.3f}s  counts='
              f'{[len(d["conf"]) for d in dets]}', flush=True)

        t0 = time.perf_counter()
        ax.astar_dists = ax._compute_detections_astar_dists()
        t1 = time.perf_counter()
        print(f'astar dists: {t1 - t0:.3f}s '
              f'({len(ax.astar_dists)} pairs)', flush=True)

        t0 = time.perf_counter()
        ax._IDed_detections = ax._assign_IDs_to_detections()
        t1 = time.perf_counter()
        print(f'mcf assign: {t1 - t0:.3f}s', flush=True)

        t0 = time.perf_counter()
        ax.IDed_dets_all = ax._agg_all_IDed_dets()
        t1 = time.perf_counter()
        print(f'agg: {t1 - t0:.3f}s  tracks={len(ax.IDed_dets_all)}',
              flush=True)




def instrumented():
    """Wrap the fused program with per-call timing, then run main()."""
    import time as _time
    import axtrack_tpu.detections as DET
    orig = DET._fused_assoc_program

    def timed(*a, **k):
        run = orig(*a, **k)

        def wrapper(padded, packed):
            t0 = _time.perf_counter()
            out = np.asarray(run(padded, packed))
            print(f'    [fused run+fetch: '
                  f'{_time.perf_counter() - t0:.3f}s '
                  f'cert={out[-1]}]', flush=True)
            return out
        return wrapper
    DET._fused_assoc_program = timed
    main()


if __name__ == '__main__' and os.environ.get('PROF_INSTR'):
    instrumented()
elif __name__ == '__main__':
    main()
