"""Measure scaling-vs-SSP MCF solve time across movie lengths (VERDICT r4 #1).

Builds synthetic tracking graphs with the same layout the tracker emits
(track/tracker.py; reference AxonDetections.py:631-696): per detection an
observation edge u_i->v_i, entry/exit edges, and transition edges to the
next 1-2 frames within a 500 px association radius, at bench density
(64 dets/frame moving smoothly) and at a LOW-identity variant (few real
tracks -> few SSP augmentations), with the reference flow bounds
MCF_MIN_FLOW=5 / MCF_MAX_FLOW=450 (exp_parameters.py:87-88).

Prints a per-size table of solve times for both solvers plus agreement
checks, feeding the BASELINE.md row and the solver-choice rule.
"""
import sys
import time

import numpy as np

sys.path.insert(0, '.')
from axtrack_tpu import native  # noqa: E402


def build_graph(T, dets_per_frame, n_tracks, rng, radius=500.0, H=2920,
                W=6364, edge_thr=0.7, track_conf=0.95, clutter_conf=0.75):
    """Synthetic tracking graph with the production structure
    (track/tracker.py): n_tracks persistent smooth movers plus clutter up
    to dets_per_frame; observation cost = clamped log-odds of conf;
    transition cost = -log((1-d/500)*miss^(gap-1)), pruned at
    MCF_EDGE_COST_THR=0.7 like the real graph build (d<=251px at gap 1,
    <=86px at gap 2 — the real graphs are far sparser than radius-500)."""
    pos = rng.uniform([0, 0], [H, W], (n_tracks, 2))
    vel = rng.normal(0, 8, (n_tracks, 2))
    frames, confs = [], []
    for t in range(T):
        pos = np.clip(pos + vel + rng.normal(0, 3, pos.shape), 0, [H, W])
        n_clutter = dets_per_frame - n_tracks
        clutter = rng.uniform([0, 0], [H, W], (n_clutter, 2))
        frames.append(np.concatenate([pos, clutter]))
        confs.append(np.concatenate([
            np.full(n_tracks, track_conf) - rng.random(n_tracks) * 0.04,
            np.full(n_clutter, clutter_conf)
            - rng.random(n_clutter) * 0.15]))
    offsets = np.arange(T + 1) * dets_per_frame
    n_dets = offsets[-1]
    src, snk = 2 * n_dets, 2 * n_dets + 1

    ef, et, ec = [], [], []
    for t in range(T):
        for i in range(dets_per_frame):
            c = confs[t][i]
            obs = float(np.clip(np.log((1 - c) / c), -4.6, 4.6))
            gi = offsets[t] + i
            ef += [2 * gi, src, 2 * gi + 1]
            et += [2 * gi + 1, 2 * gi, snk]
            ec += [obs, 2.0, 2.0]  # obs log-odds; entry/exit cost 2
    for t in range(1, T):
        for gap in (1, 2):
            tb = t - gap
            if tb < 0:
                continue
            A = frames[tb][:, None, :] - frames[t][None, :, :]
            d = np.sqrt((A * A).sum(-1))
            p = np.maximum(1 - d / radius, 1e-8) * (0.6 ** (gap - 1))
            c = -np.log(p)
            ii, jj = np.nonzero((d < radius) & (c <= edge_thr))
            ef.extend(2 * (offsets[tb] + ii) + 1)
            et.extend(2 * (offsets[t] + jj))
            ec.extend(c[ii, jj])
    return (2 * n_dets + 2,
            np.asarray(ef, np.int64), np.asarray(et, np.int64),
            np.asarray(ec, np.float64))


def timed(fn, reps=3):
    best = float('inf')
    out = None
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        best = min(best, time.perf_counter() - t0)
    return best, out


def main():
    rng = np.random.default_rng(0)
    print(f"{'T':>4} {'tracks':>6} {'nodes':>7} {'edges':>8} "
          f"{'scaling':>10} {'ssp':>10} {'flow':>5} agree")
    for T, dpf, n_tracks, cc in [
        (20, 64, 48, 0.75),    # bench density, flow ~ n_tracks
        (60, 64, 48, 0.75),
        (120, 64, 48, 0.75),
        (300, 64, 48, 0.75),
        (60, 40, 6, 0.75),     # the low-identity regime VERDICT measured
        (120, 40, 6, 0.75),
        (300, 40, 6, 0.75),
        (120, 64, 48, 0.99),   # confident clutter: flow runs to the cap
        (300, 64, 48, 0.99),
    ]:
        n, ef, et, ec = build_graph(T, dpf, n_tracks, rng, clutter_conf=cc)
        reps = 3 if n < 20000 else 2
        ts, (fs, flow_s, cost_s) = timed(
            lambda: native.solve_tracking_mcf(n, ef, et, ec, 5, 450,
                                              method='scaling'), reps)
        to, (fo, flow_o, cost_o) = timed(
            lambda: native.solve_tracking_mcf(n, ef, et, ec, 5, 450,
                                              method='ssp'), reps)
        agree = fs == fo and abs(cost_s - cost_o) < 1e-6
        print(f"{T:>4} {n_tracks:>6} {n:>7} {len(ef):>8} "
              f"{ts * 1e3:>8.1f}ms {to * 1e3:>8.1f}ms {fs:>5} {agree}")
        assert agree, (T, fs, fo, cost_s, cost_o)


if __name__ == '__main__':
    main()
