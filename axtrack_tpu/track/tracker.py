"""Global min-cost-flow identity tracker.

TPU-framework replacement for the reference's libmot ``MinCostFlowTracker``
(reference AxonDetections.py:631-715; libmot is an unvendored submodule
wrapping OR-Tools). The graph follows Zhang et al. 2008 network-flow MOT,
reconstructed from the reference's call surface and parameter docs
(AxonDetections.py:663-676, 845-878):

- per detection i: edge u_i -> v_i with observation cost (log-odds of the
  capped confidence, costs.observation_costs)
- source -> u_i entry and v_i -> sink exit edges, cost MCF_ENTRY_EXIT_COST
- v_i(t-gap) -> u_j(t) transition edges for gap in 1..MCF_MAX_NUM_MISSES+1
  with cost -log((1-w)*(1-d/500)*miss_rate^(gap-1) + w*vis_sim + 1e-6);
  unreachable (d == 500) and cost > MCF_EDGE_COST_THR edges are pruned
  (the reference documents edge_cost_thr as "the maximum cost for an edge
  to still be considered", AxonDetections.py:855-858; we apply it to
  transition edges)
- solved exactly over flow in [MCF_MIN_FLOW, MCF_MAX_FLOW] by the native
  SSP solver (native/mcf.cpp); infeasible -> None, mirroring the
  reference's graceful failure (AxonDetections.py:691-696)

Trajectory IDs are numbered by (start frame, detection index) — the
reference's IDs come from libmot's internal trajectory order, which is not
reconstructible; ordering is deterministic either way.
"""
import numpy as np

from .. import native
from . import costs as C


class TrackGraphResult:
    def __init__(self, trajectories, flow, total_cost):
        self.trajectories = trajectories     # list of list[(frame, det_idx)]
        self.flow = flow
        self.total_cost = total_cost


def assign_identities(frame_dets, astar_dists, params, vis_feats=None):
    """Solve the identity-association MCF.

    Args:
      frame_dets: list over frames of dict(conf f32[N_t], x, y) — the 'all'
        detections per frame (reference uses all dets above 0.55,
        AxonDetections.py:653).
      astar_dists: dict[(t, t_gap)] -> f32[N_{t-gap}, N_t] node-count
        distance matrices (max_px_assoc_dist marks unreachable).
      params: flat parameter dict (MCF_* keys).
      vis_feats: optional list over frames of f32[N_t, n_bins] appearance
        features (used when MCF_VIS_SIM_WEIGHT > 0).

    Returns TrackGraphResult or None when the flow range is infeasible.
    """
    max_px = 500
    n_frames = len(frame_dets)
    obs, offsets, counts = C.observation_setup(frame_dets, params)
    n_dets = int(offsets[-1])

    src = 2 * n_dets
    snk = 2 * n_dets + 1
    # structural edges, interleaved so edge 3i is the observation edge
    # u_i -> v_i, 3i+1 the entry, 3i+2 the exit (the decomposition below
    # indexes flow[] by this layout)
    ids = np.arange(n_dets)
    ef_s = np.empty(3 * n_dets, np.int64)
    et_s = np.empty(3 * n_dets, np.int64)
    ec_s = np.empty(3 * n_dets, np.float64)
    ef_s[0::3], et_s[0::3], ec_s[0::3] = 2 * ids, 2 * ids + 1, obs
    ef_s[1::3], et_s[1::3], ec_s[1::3] = src, 2 * ids, \
        params['MCF_ENTRY_EXIT_COST']
    ef_s[2::3], et_s[2::3], ec_s[2::3] = 2 * ids + 1, snk, \
        params['MCF_ENTRY_EXIT_COST']

    n_struct = 3 * n_dets
    ef_blocks, et_blocks, ec_blocks = [ef_s], [et_s], [ec_s]
    gp_blocks, gc_blocks = [], []   # transition edge endpoints (global ids)
    for t in range(n_frames):
        for gap in range(1, params['MCF_MAX_NUM_MISSES'] + 2):
            tb = t - gap
            if tb < 0 or (t, gap) not in astar_dists:
                continue
            d = np.asarray(astar_dists[(t, gap)], np.float64)
            if d.size == 0:
                continue
            vis_sim = None
            w = params['MCF_VIS_SIM_WEIGHT']
            if w:
                if vis_feats is None:
                    # computing -log((1-w)*closeness + 0) here would
                    # silently inflate every transition cost by the
                    # missing appearance term — refuse instead
                    raise ValueError(
                        'MCF_VIS_SIM_WEIGHT > 0 requires vis_feats '
                        '(per-frame appearance histograms); got None')
                vis_sim = C.bhattacharyya_similarity(vis_feats[tb],
                                                     vis_feats[t])
            cost = C.transition_costs(d, params['MCF_MISS_RATE'], gap,
                                      max_px, vis_sim, w)
            keep = np.isfinite(cost) & (cost <= params['MCF_EDGE_COST_THR'])
            pi, ci = np.nonzero(keep)
            gp = offsets[tb] + pi
            gc = offsets[t] + ci
            ef_blocks.append(2 * gp + 1)
            et_blocks.append(2 * gc)
            ec_blocks.append(cost[pi, ci])
            gp_blocks.append(gp)
            gc_blocks.append(gc)

    flow_val, flow, total_cost = native.solve_tracking_mcf(
        2 * n_dets + 2, np.concatenate(ef_blocks),
        np.concatenate(et_blocks), np.concatenate(ec_blocks),
        params['MCF_MIN_FLOW'], params['MCF_MAX_FLOW'])
    if flow_val is None:
        return None

    # decompose: successor map from transition edges with flow
    gp_all = (np.concatenate(gp_blocks) if gp_blocks
              else np.empty(0, np.int64))
    gc_all = (np.concatenate(gc_blocks) if gc_blocks
              else np.empty(0, np.int64))
    tflow = flow[n_struct:].astype(bool)
    succ = np.full(n_dets, -1, np.int64)
    succ[gp_all[tflow]] = gc_all[tflow]
    # starts: covered detections (flow on obs edge 3i) whose ENTRY edge
    # (3i+1) carries flow; ascending global id == (frame, id) order since
    # offsets are nondecreasing
    starts = ids[(flow[0:n_struct:3] > 0) & (flow[1:n_struct:3] > 0)]
    frame_of = np.searchsorted(offsets, ids, 'right') - 1
    local_of = ids - offsets[frame_of]

    trajectories = []
    for s in starts:
        traj = []
        g = int(s)
        while True:
            traj.append((int(frame_of[g]), int(local_of[g])))
            if succ[g] < 0:
                break
            g = int(succ[g])
        trajectories.append(traj)
    return TrackGraphResult(trajectories, flow, total_cost)
