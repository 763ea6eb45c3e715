"""Production-API throughput: the same reference-scale workload as bench.py
but driven through the PUBLIC surface (Timelapse -> AxonDetections
.detect_dataset / .assign_ids) instead of bench.py's hand-built stage
programs. This is what a user migrating from the reference actually calls;
the gap between this number and bench.py's is the production-path overhead
(host orchestration, chunking, caching hooks).
"""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import json
import time

import numpy as np


def main():
    import jax
    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), '.jax_cache')
    try:
        jax.config.update('jax_compilation_cache_dir', cache_dir)
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    except Exception:
        pass

    from axtrack_tpu.params import get_default_parameters
    from axtrack_tpu.data.synthetic import write_fixture
    from axtrack_tpu.data.timelapse import Timelapse
    from axtrack_tpu.models.yolo import build_model, init_variables
    from axtrack_tpu.detections import AxonDetections

    n_frames = int(os.environ.get('BENCH_FRAMES', 8))
    fxdir = os.path.join(cache_dir, f'prod_fixture_{n_frames}')
    marker = os.path.join(fxdir, 'movie.tif')
    if not os.path.exists(marker):
        os.makedirs(fxdir, exist_ok=True)
        print('# writing full-size fixture (one-time)...', file=sys.stderr)
        write_fixture(fxdir, name='movie', T=n_frames + 4, H=2920, W=6364,
                      n_axons=40, seed=0, n_channels=8)

    # prefer the TRAINED deployed bundle (realistic detection density — a
    # random-weight net saturates the 1024-det production cap with noise
    # and measures a workload the pipeline never sees); fall back to random
    # weights if the bundle hasn't been built (make deploy-model)
    from axtrack_tpu.config import DEPLOYED_MODEL_DIR
    # BENCH_PRECISION: f32 | mixed (default — bf16 convs + f32 FC head,
    # measured 0.0% detection mismatch after 1px on the deployed bundle,
    # scripts/check_bf16_parity.py) | bf16
    precision = os.environ.get('BENCH_PRECISION', 'mixed')
    scaler = ('zscore', None)
    if os.path.exists(os.path.join(DEPLOYED_MODEL_DIR, 'params.json')):
        import axtrack_tpu as axtrack
        import tempfile
        P, (model, variables), scaler = axtrack.setup_inference(
            tempfile.mkdtemp(prefix='prod_bench_'), precision=precision)
        print(f'# using trained deployed bundle (precision={precision})',
              file=sys.stderr)
    else:
        import jax.numpy as jnp
        P = get_default_parameters()
        model = build_model(
            P,
            dtype=jnp.float32 if precision == 'f32' else jnp.bfloat16,
            fc_dtype=jnp.float32 if precision == 'mixed' else None)
        variables = init_variables(model, P, seed=0)
        print(f'# deployed bundle absent: random weights '
              f'(precision={precision})', file=sys.stderr)
    P['MCF_MIN_FLOW'] = 1
    P['MCF_MAX_FLOW'] = 200

    tl = Timelapse(
        imseq_path=os.path.join(fxdir, 'movie.tif'),
        labels_csv=None,
        mask_path=os.path.join(fxdir, 'movie_mask.npy'),
        timepoints=None, offset=None, log_correct=True,
        standardize_framewise=False, standardize=scaler,
        name='prod_bench', use_transforms=[], contrast_llim=55,
        plot=False, pad=None, Sy=P['SY'], Sx=P['SX'],
        tilesize=P['TILESIZE'], cache=None, from_cache=None,
        temporal_context=P['TEMPORAL_CONTEXT'])

    def run_once():
        ax = AxonDetections((model, variables), tl, P, directory=None)
        t0 = time.perf_counter()
        ax.detect_dataset()
        t_detect = time.perf_counter() - t0
        t0 = time.perf_counter()
        ax.assign_ids()
        t_assign = time.perf_counter() - t0
        ntracks = (len(ax.IDed_dets_all)
                   if ax.IDed_dets_all is not None else 0)
        return t_detect, t_assign, ntracks

    # BENCH_MANY=N: serve N movies through the public inference_many
    # surface (overlapped dispatch + per-movie device-array release) and
    # report steady-state fps alongside the sequential number
    n_many = int(os.environ.get('BENCH_MANY', 0))
    if n_many > 1:
        import axtrack_tpu as axtrack

        def make_tl(i):
            return Timelapse(
                imseq_path=os.path.join(fxdir, 'movie.tif'),
                labels_csv=None,
                mask_path=os.path.join(fxdir, 'movie_mask.npy'),
                timepoints=None, offset=None, log_correct=True,
                standardize_framewise=False, standardize=scaler,
                name=f'prod_many{i}', use_transforms=[], contrast_llim=55,
                plot=False, pad=None, Sy=P['SY'], Sx=P['SX'],
                tilesize=P['TILESIZE'], cache=None, from_cache=None,
                temporal_context=P['TEMPORAL_CONTEXT'])

        tls = [make_tl(i) for i in range(n_many)]
        dests = [tempfile.mkdtemp(prefix=f'many{i}_') for i in range(n_many)]
        kw = dict(detections_cache=None, astar_paths_cache=None,
                  assigedIDs_cache=None)
        axtrack.inference_many(tls[:1], model_tuple := (model, variables),
                               dests[:1], P, **kw)      # compile pass
        t0 = time.perf_counter()
        outs = axtrack.inference_many(tls, model_tuple, dests, P, **kw)
        el_many = time.perf_counter() - t0
        t0 = time.perf_counter()
        for tl, dest in zip(tls, dests):
            axtrack.inference(tl, model_tuple, dest, P, **kw)
            # the fair baseline releases per movie like inference_many
            # does — WITHOUT this the sequential loop itself OOMs on the
            # 2nd full-size movie (accumulated tile stacks), which is
            # the failure mode inference_many's lifecycle prevents
            tl.release_device_arrays()
        el_seq = time.perf_counter() - t0
        n_fr = sum(len(tl.timepoints) for tl in tls)
        print(json.dumps({
            'metric': 'public_serving_frames_per_sec',
            'value': round(n_fr / el_many, 2),
            'sequential_fps': round(n_fr / el_seq, 2),
            'n_movies': n_many, 'n_frames': n_fr,
        }))
        return

    print('# pass 1 (compile)...', file=sys.stderr)
    run_once()
    best = (np.inf, np.inf, 0)
    for _ in range(2):
        r = run_once()
        if r[0] + r[1] < best[0] + best[1]:
            best = r
    t_detect, t_assign, ntracks = best
    fps = len(tl.timepoints) / (t_detect + t_assign)
    print(json.dumps({
        'metric': 'production_api_frames_per_sec',
        'value': round(fps, 2),
        'detect_s': round(t_detect, 3),
        'assign_s': round(t_assign, 3),
        'n_frames': len(tl.timepoints),
        'n_tracks': ntracks,
    }))


if __name__ == '__main__':
    main()
