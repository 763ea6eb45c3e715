"""Mesh-path overhead, device-program isolation (VERDICT r4 next #7).

bench_mesh_overhead.py times full `engine.one_epoch` wall-clock epochs,
which on this 1-core host are dominated by per-epoch host augmentation +
tiling variance (two runs measured +9.2% and -17.1% — i.e. noise).
This script isolates the thing #7 actually asks about: does the MESH
PROGRAM (with_sharding_constraint at the gather output, inputs placed
with replicate_put, params distributed) cost anything over the unmeshed
epoch-scan program at dp=1/tp=1?

Method: one dataset setup; the SAME device-resident tiles/targets/batch
indices; both `engine._make_scan_epoch` programs (state.mesh None vs
degenerate 1x1 mesh) slope-timed back to back (queue M executions,
difference M=2 vs M=6 — the tunnel dispatch floor and the result fetch
cancel). Prints one JSON line.

Run on TPU:  python scripts/bench_mesh_overhead2.py
"""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), '.jax_cache')
    try:
        jax.config.update('jax_compilation_cache_dir', cache_dir)
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    except Exception:
        pass

    from axtrack_tpu.params import get_default_parameters
    from axtrack_tpu.data.synthetic import write_fixture
    from axtrack_tpu.train import engine
    from axtrack_tpu.parallel.mesh import make_mesh, distribute_state, \
        replicate_put

    n_frames = int(os.environ.get('BENCH_FRAMES', 8))
    fxdir = os.path.join(cache_dir, f'prod_fixture_{n_frames}')
    if not os.path.exists(os.path.join(fxdir, 'movie.tif')):
        os.makedirs(fxdir, exist_ok=True)
        print('# writing full-size fixture (one-time)...', file=sys.stderr)
        write_fixture(fxdir, name='movie', T=n_frames + 4, H=2920, W=6364,
                      n_axons=40, seed=0, n_channels=8)

    P = get_default_parameters()
    P.update(dict(
        TIMELAPSE_FILE=os.path.join(fxdir, 'movie.tif'),
        LABELS_FILE=os.path.join(fxdir, 'movie_labels.csv'),
        MASK_FILE=os.path.join(fxdir, 'movie_mask.npy'),
        TRAIN_TIMEPOINTS=list(range(2, 2 + n_frames)),
        TEST_TIMEPOINTS=[2, 3],
        CACHE=None, FROM_CACHE=None, PLOT_PREPROC=False,
        USE_TRANSFORMS=[],            # fixed tiling: identical programs
    ))

    train_data, _ = engine.setup_data(P, skip_test=True)
    train_data.construct_tiles()
    tc = train_data.temporal_context
    K = train_data.X_tiled.shape[1]
    tiles_h = np.asarray(train_data.X_tiled)
    targets_h = np.asarray(train_data.target_tiled)
    tp_idx_h = np.asarray(train_data.timepoints_indices, np.int32)

    n_tiles = len(train_data.timepoints_indices) * K
    rng = np.random.default_rng(0)
    order = rng.permutation(n_tiles)
    bs = P['BATCH_SIZE']
    n_full = n_tiles // bs
    full = jnp.asarray(order[:n_full * bs].reshape(n_full, bs)
                       .astype(np.int32))

    def timeit(fn, args, reps=5):
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
            run(6)
            hi = min(hi, time.perf_counter() - t0)
        return (hi - lo) / 4

    results = {}
    for tag in ('unmeshed', 'mesh_dp1'):
        state = engine.setup_model(P)
        state._steps = engine.make_train_step(state.model, state.tx, P)
        if tag == 'mesh_dp1':
            mesh = make_mesh(n_data=1, n_model=1)
            state = distribute_state(state, mesh)
            tiles, targets, tp_idx = replicate_put(
                (jnp.asarray(tiles_h), jnp.asarray(targets_h),
                 jnp.asarray(tp_idx_h)), mesh)
        else:
            tiles = jnp.asarray(tiles_h)
            targets = jnp.asarray(targets_h)
            tp_idx = jnp.asarray(tp_idx_h)
        scan_epoch = engine._make_scan_epoch(state, 'train', tc, K)
        args = (state.params, state.batch_stats, state.opt_state,
                tiles, targets, tp_idx, full)
        results[tag] = timeit(scan_epoch, args)
        print(f'# {tag}: {results[tag]:.3f}s per epoch scan '
              f'({n_full} batches of {bs})', file=sys.stderr)

    ovh = (results['mesh_dp1'] - results['unmeshed']) / results['unmeshed']
    print(json.dumps({
        'metric': 'mesh_dp1_scan_overhead_pct',
        'value': round(ovh * 100, 1),
        'unmeshed_scan_s': round(results['unmeshed'], 3),
        'mesh_dp1_scan_s': round(results['mesh_dp1'], 3),
        'unit': f'% device epoch-scan overhead ({n_full} batches x {bs} '
                f'tiles, {n_frames} frames 2920x6364)',
    }))


if __name__ == '__main__':
    main()
