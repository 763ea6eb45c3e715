"""Mesh-path overhead at dp=1/tp=1 on the real chip (VERDICT r4 next #7).

Only one real TPU chip is available in this environment, so multi-chip
wall-clock stays a projection — but the one number this machine CAN
measure is whether the mesh program (with_sharding_constraint
annotations, replicate/shard device_puts, state.mesh routing through
engine.one_epoch) costs anything over the unmeshed epoch when the mesh
is degenerate. It must be ~0%: that makes ``run_experiment(mesh=...)``
safe to use unconditionally while real multi-chip is unavailable.

Same workload as bench_train_e2e.py (full-size 2920x6364 movie, real
engine.one_epoch with fresh per-epoch augmentation+tiling+scan).
"""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import json
import time


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
    from axtrack_tpu.train import engine
    from axtrack_tpu.parallel.mesh import make_mesh, distribute_state

    n_frames = int(os.environ.get('BENCH_FRAMES', 8))
    n_epochs = int(os.environ.get('BENCH_EPOCHS', 4))
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
        USE_TRANSFORMS=['vflip', 'hflip', 'translateX', 'translateY'],
    ))

    train_data, _ = engine.setup_data(P, skip_test=True)

    def run(tag, state):
        import numpy as np
        np.random.seed(P['SEED'])      # identical batch shuffles per run
        times = []
        for epoch in range(1, n_epochs):
            t0 = time.perf_counter()
            el = engine.one_epoch(train_data, state, P, epoch=epoch + 2,
                                  train=True, min_pos_rate=0)
            jax.block_until_ready(state.params)
            times.append(time.perf_counter() - t0)
            print(f'# {tag} epoch {epoch}: {times[-1]:.2f}s '
                  f'loss={float(el["total_summed_loss"]):.1f}',
                  file=sys.stderr)
        return min(times[1:])

    base = run('unmeshed', engine.setup_model(P))
    mesh = make_mesh(n_data=1, n_model=1)
    meshed = run('mesh dp=1', distribute_state(engine.setup_model(P), mesh))

    overhead = (meshed - base) / base * 100
    print(json.dumps({
        'metric': 'mesh_dp1_overhead_pct',
        'value': round(overhead, 1),
        'unmeshed_epoch_s': round(base, 2),
        'mesh_dp1_epoch_s': round(meshed, 2),
        'unit': f'% epoch overhead ({n_frames} frames 2920x6364)',
    }))


if __name__ == '__main__':
    main()
