"""Training-throughput benchmark on TPU (VERDICT r1 item 10).

Measures the production device-resident epoch path (engine.run_epoch_device:
jitted lax.scan over batches) at the reference deployment shapes: the
deployed ARCHITECTURE (params.py defaults), 512x512 5-channel tiles,
BATCH_SIZE 32 (deployed_model/params.txt:25). Tile contents are synthetic —
throughput depends on shapes, not values.

Reports steps/s and the extrapolated wall-clock for a reference-scale epoch
(323 train frames x ~70 kept tiles / 32 ~= 707 steps,
deployed_model/params.txt:6,26) plus the 1501-epoch total. Results are
recorded in BASELINE.md.
"""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time
import types

import numpy as np
import jax
import jax.numpy as jnp

from axtrack_tpu.params import get_default_parameters
from axtrack_tpu.train import engine


def main():
    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), '.jax_cache')
    try:
        jax.config.update('jax_compilation_cache_dir', cache_dir)
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    except Exception:
        pass

    P = get_default_parameters()
    T = int(os.environ.get('BENCH_TRAIN_FRAMES', 24))
    K = int(os.environ.get('BENCH_TRAIN_TILES', 64))
    tc = P['TEMPORAL_CONTEXT']
    ts = P['TILESIZE']
    bs = P['BATCH_SIZE']

    rng = np.random.default_rng(0)
    # device-resident layout: X_tiled [T + 2*tc, K, ts, ts] standardized f32
    X_tiled = rng.normal(0.0, 1.0, (T + 2 * tc, K, ts, ts)).astype(np.float32)
    target = np.zeros((T + 2 * tc, K, P['SX'], P['SY'], 3), np.float32)
    pos = rng.random((T + 2 * tc, K, P['SX'], P['SY'])) < 0.05
    target[..., 0] = pos
    target[..., 1:] = rng.random((T + 2 * tc, K, P['SX'], P['SY'], 2))

    # device-resident, as Timelapse.construct_tiles now produces them: the
    # movie ships once, epochs run without host round-trips
    ds = types.SimpleNamespace(
        X_tiled=jnp.asarray(X_tiled), target_tiled=jnp.asarray(target),
        timepoints_indices=np.arange(tc, tc + T),
        temporal_context=tc, name='bench')
    ds.__len__ = lambda: T * K
    jax.block_until_ready(ds.X_tiled)

    state = engine.setup_model(P)
    state._steps = engine.make_train_step(state.model, state.tx, P)

    n = T * K
    indices = np.arange(n)
    print(f'# {T} frames x {K} tiles of {ts}px, batch {bs} '
          f'-> {n // bs} steps/epoch; X_tiled {X_tiled.nbytes / 1e9:.2f} GB',
          file=sys.stderr)

    times = []
    for epoch in range(3):
        rng.shuffle(indices)
        t0 = time.perf_counter()
        engine.run_epoch_device(state, state._steps, ds, 'train', P,
                                indices)
        jax.block_until_ready(state.params)
        times.append(time.perf_counter() - t0)
        print(f'# epoch {epoch}: {times[-1]:.2f}s', file=sys.stderr)

    # epoch 0 includes compile + weight transfer; steady state from epoch 1+
    steady = min(times[1:])
    steps = n // bs
    steps_per_s = steps / steady
    ref_steps = 323 * 70 // 32          # reference-scale epoch
    ref_epoch_s = ref_steps / steps_per_s
    import json
    print(json.dumps({
        'metric': 'train_steps_per_sec',
        'value': round(steps_per_s, 2),
        'unit': f'batch-{bs} steps/sec (512px 5ch tiles, deployed arch)',
        'steady_epoch_s': round(steady, 2),
        'ref_epoch_s_est': round(ref_epoch_s, 1),
        'ref_1501_epochs_h_est': round(ref_epoch_s * 1501 / 3600, 2),
    }))


if __name__ == '__main__':
    main()
