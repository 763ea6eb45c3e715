"""End-to-end training epoch wall-clock through the REAL path on TPU.

Unlike bench_train.py (which times the epoch scan on a synthetic tile
namespace), this drives engine.one_epoch with an actual Timelapse on a
full-size 2920x6364 synthetic movie: per-epoch device augmentation,
device tiling, pos-rate redraw bookkeeping, the jitted epoch scan, and the
loss aggregation. Epoch 2+ wall-clock is the honest number for the
device-resident training claims (VERDICT r1 item 2).
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
    from axtrack_tpu.train import engine

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
        USE_TRANSFORMS=['vflip', 'hflip', 'translateX', 'translateY'],
    ))

    train_data, _ = engine.setup_data(P, skip_test=True)
    state = engine.setup_model(P)

    times = []
    for epoch in range(1, 4):
        t0 = time.perf_counter()
        el = engine.one_epoch(train_data, state, P, epoch=epoch + 2,
                              train=True, min_pos_rate=0)
        # epochs 3..5: skip the every-10th-epoch F1 sweep so the number is
        # the pure train-epoch cost (the sweep is its own measured path)
        jax.block_until_ready(state.params)
        times.append(time.perf_counter() - t0)
        print(f'# epoch {epoch}: {times[-1]:.2f}s '
              f'loss={float(el["total_summed_loss"]):.1f}', file=sys.stderr)

    steady = min(times[1:])
    print(json.dumps({
        'metric': 'e2e_train_epoch_sec',
        'value': round(steady, 2),
        'unit': (f'seconds/epoch ({n_frames} frames 2920x6364, device '
                 'augmentation+tiling+scan, deployed arch)'),
        'epoch0_s': round(times[0], 2),
    }))


if __name__ == '__main__':
    main()
