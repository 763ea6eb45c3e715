"""High-density tracker throughput: scan tracker vs host MCF
(VERDICT r2 item 6's "Done" row).

The scan tracker (track/lap_device.track_scan) runs the whole movie as one
jitted lax.scan — one dispatch total — vs the exact host MCF solve
(native/mcf.cpp). Measured at the production detection cap
(1024 dets/frame) and at typical biology density (64).

Run: python scripts/bench_tracker.py
"""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')


def make_instance(T, n_dets, rng, counts=None):
    """Plausible tracking instance: persistent targets moving smoothly, so
    both solvers do real linking work. ``counts`` (optional, [T]) drops
    each frame's detections to counts[t] — the skewed-density case where
    one dense frame inflates the padded capacity D while typical frames
    hold far fewer dets (the regime VERDICT r3 weak #4's packed staging
    targets: the dense [T, G, D, D] tensor was O(T*G*D^2) regardless)."""
    pts = rng.uniform(50, 2000, (n_dets, 2))
    frames, dists = [], {}
    traj_pts = []
    keep_idx = []
    for t in range(T):
        pts = pts + rng.normal(0, 8, pts.shape)
        n_t = n_dets if counts is None else int(counts[t])
        keep_idx.append(np.arange(n_t))
        p = pts[:n_t]
        traj_pts.append(p.copy())
        frames.append({'conf': (0.7 + 0.3 * rng.random(n_t)
                                ).astype(np.float32),
                       'x': p[:, 0].astype(np.int32),
                       'y': p[:, 1].astype(np.int32)})
    for t in range(1, T):
        for g in (1, 2):
            s = t - g
            if s < 0:
                continue
            d = np.linalg.norm(traj_pts[s][:, None] - traj_pts[t][None],
                               axis=-1).astype(np.float32)
            d[d >= 480] = 500.0
            dists[(t, g)] = d
    return frames, dists


def main():
    from axtrack_tpu.track.lap_device import OnlineTracker
    from axtrack_tpu.track import tracker as mcf_tracker

    P = dict(MCF_EDGE_COST_THR=0.7, MCF_ENTRY_EXIT_COST=2,
             MCF_MISS_RATE=0.6, MCF_MAX_NUM_MISSES=1,
             MCF_MAX_CONF_COST=4.6, MCF_MIN_FLOW=1, MCF_MAX_FLOW=2000,
             MCF_VIS_SIM_WEIGHT=0.0,
             MCF_CONF_CAPPING_METHOD='scale_to_max')
    rng = np.random.default_rng(0)
    T = 20
    for n_dets in (64, 256, 1024, 'skew'):
        if n_dets == 'skew':
            # ONE saturating frame (1024) among typical-biology frames
            # (100): the padded capacity D is forced to 1024 while the
            # real data is ~1% of D^2 — the dense-staging worst case
            counts = np.full(T, 100)
            counts[T // 2] = 1024
            frames, dists = make_instance(T, 1024, rng, counts=counts)
        else:
            frames, dists = make_instance(T, n_dets, rng)
        trk = OnlineTracker(P)
        trajs = trk.track(frames, dists)          # compile
        t0 = time.time()
        trajs = trk.track(frames, dists)
        dt_scan = time.time() - t0

        t0 = time.time()
        res = mcf_tracker.assign_identities(frames, dists, P)
        dt_mcf = time.time() - t0
        n_mcf = len(res.trajectories) if res else -1
        long_scan = sum(1 for tr in trajs if len(tr) >= T - 2)
        print(f'{n_dets!s:>5} dets/frame x {T} frames: '
              f'scan {dt_scan:6.2f}s ({T/dt_scan:7.1f} fps, '
              f'{long_scan} full tracks) | '
              f'host MCF {dt_mcf:6.2f}s ({T/dt_mcf:7.1f} fps, '
              f'{n_mcf} tracks)', flush=True)


if __name__ == '__main__':
    main()
