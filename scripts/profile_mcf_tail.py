"""Break the bench.py single-movie MCF tail (~83ms at 20 frames) into
graph-build (Python/numpy) vs native solve vs decomposition."""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time
import numpy as np


def main():
    import bench
    import jax
    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), '.jax_cache')
    jax.config.update('jax_compilation_cache_dir', cache_dir)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    from axtrack_tpu.params import get_default_parameters
    from axtrack_tpu.models.yolo import build_model, init_variables
    import jax.numpy as jnp

    n_frames = int(os.environ.get('BENCH_FRAMES', 20))
    P = get_default_parameters()
    frames, mask, _ = bench.build_workload(T=n_frames)
    model = build_model(P, dtype=jnp.bfloat16, fc_dtype=jnp.float32)
    variables = init_variables(model, P, seed=0)
    S = bench.build_tpu_stages(frames, mask, P, model, variables, n_frames)
    fr_d, m_d, flat_d, tyx_d = S['args']
    conf_d, xs_d, ys_d, alive_d = S['stage_det'](fr_d, m_d, flat_d, tyx_d)
    packed = np.asarray(S['stage_assoc'](m_d, conf_d, ys_d, xs_d, alive_d))
    MAXD = S['maxd']
    nfd = n_frames * MAXD
    conf = packed[:nfd].reshape(n_frames, MAXD)
    xs = packed[nfd:2 * nfd].reshape(n_frames, MAXD).astype(np.int32)
    ys = packed[2 * nfd:3 * nfd].reshape(n_frames, MAXD).astype(np.int32)
    alive = packed[3 * nfd:4 * nfd].reshape(n_frames, MAXD) > 0.5
    pairs = S['pairs']
    D_all = packed[4 * nfd:4 * nfd + len(pairs) * MAXD * MAXD].reshape(
        len(pairs), MAXD, MAXD)
    frame_dets = []
    for i in range(n_frames):
        k = alive[i]
        frame_dets.append({'conf': conf[i][k].astype(np.float32),
                           'x': xs[i][k].astype(np.int32),
                           'y': ys[i][k].astype(np.int32)})
    astar_dists = {}
    for k, (s, gap) in enumerate(pairs):
        t = s + gap
        astar_dists[(t, gap)] = D_all[k][alive[s]][:, alive[t]]

    from axtrack_tpu.track import tracker, costs as C
    from axtrack_tpu import native

    mcf_params = {k: P[k] for k in P if k.startswith('MCF_')}
    mcf_params['MCF_MIN_FLOW'] = 1
    mcf_params['MCF_MAX_FLOW'] = 200

    for rep in range(3):
        t0 = time.perf_counter()
        obs, offsets, counts = C.observation_setup(frame_dets, mcf_params)
        n_dets = int(offsets[-1])
        t_obs = time.perf_counter() - t0

        # graph build (replicate assign_identities internals)
        t0 = time.perf_counter()
        src = 2 * n_dets
        snk = 2 * n_dets + 1
        ef, et, ec = [], [], []
        for i in range(n_dets):
            ef += [2 * i, src, 2 * i + 1]
            et += [2 * i + 1, 2 * i, snk]
            ec += [obs[i], mcf_params['MCF_ENTRY_EXIT_COST'],
                   mcf_params['MCF_ENTRY_EXIT_COST']]
        for t in range(n_frames):
            for gap in range(1, mcf_params['MCF_MAX_NUM_MISSES'] + 2):
                tb = t - gap
                if tb < 0 or (t, gap) not in astar_dists:
                    continue
                d = np.asarray(astar_dists[(t, gap)], np.float64)
                if d.size == 0:
                    continue
                cost = C.transition_costs(d, mcf_params['MCF_MISS_RATE'],
                                          gap, 500, None, 0)
                keep = (np.isfinite(cost)
                        & (cost <= mcf_params['MCF_EDGE_COST_THR']))
                pi, ci = np.nonzero(keep)
                gp = offsets[tb] + pi
                gc = offsets[t] + ci
                ef.extend(2 * gp + 1)
                et.extend(2 * gc)
                ec.extend(cost[pi, ci])
        efa, eta, eca = np.asarray(ef), np.asarray(et), np.asarray(ec)
        t_build = time.perf_counter() - t0

        t0 = time.perf_counter()
        flow_val, flow, total_cost = native.solve_tracking_mcf(
            2 * n_dets + 2, efa, eta, eca, 1, 200)
        t_solve = time.perf_counter() - t0
        if rep == 0:
            np.savez('/tmp/mcf_graph.npz', n_nodes=2 * n_dets + 2,
                     ef=efa, et=eta, ec=eca)

        t0 = time.perf_counter()
        res = tracker.assign_identities(frame_dets, astar_dists, mcf_params)
        t_all = time.perf_counter() - t0
        print(f'rep{rep}: n_dets={n_dets} edges={len(efa)} '
              f'obs={t_obs*1e3:.1f}ms build={t_build*1e3:.1f}ms '
              f'solve={t_solve*1e3:.1f}ms flow={flow_val} '
              f'full_assign={t_all*1e3:.1f}ms '
              f'tracks={len(res.trajectories)}', flush=True)


if __name__ == '__main__':
    main()
