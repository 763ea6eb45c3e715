"""MOT-challenge metric suite (motmetrics replacement).

The reference evaluates ID assignment with the py-motmetrics package
(reference AxonDetections.py:885-896: compare_to_groundtruth with squared-
euclidean distance + motchallenge_metrics). That package is not available in
this image, so the needed metrics are implemented here:

- CLEAR-MOT (Bernardin & Stiefelhagen): per-frame matching with carryover of
  previous correspondences, Hungarian on the rest -> MOTA, MOTP, misses,
  false positives, ID switches/fragmentations, and the motmetrics event
  taxonomy refinements (num_transfer/num_ascend/num_migrate).
- ID metrics (Ristani et al. 2016): global trajectory LAP -> IDF1/IDP/IDR.
- track coverage: mostly_tracked (>=80%), partially_tracked, mostly_lost.

The returned Series carries the full ``motchallenge_metrics`` column set the
reference writes to MCF_params_results.csv (AxonDetections.py:885-896).

Inputs are libmot-format DataFrames: index (FrameId, Id), columns at least
X, Y (top-left box corner — consistent between GT and predictions, so the
center offset cancels). ``distth`` is a threshold on *squared* euclidean
distance, matching motmetrics' 'euclidean' convention the reference relies
on (distth=(nms_min_dist)**2).
"""
import numpy as np
import pandas as pd
from scipy.optimize import linear_sum_assignment


def _frames_dict(df):
    out = {}
    for (frame, oid), row in df.iterrows():
        out.setdefault(int(frame), {})[oid] = (float(row['X']),
                                               float(row['Y']))
    return out


def mot_metrics(gt_df, pred_df, distth):
    """Compute the metric series for one sequence. Returns pd.Series with
    motchallenge-style keys."""
    gt = _frames_dict(gt_df)
    pred = _frames_dict(pred_df)
    frames = sorted(set(gt) | set(pred))

    # py-motmetrics event taxonomy: a frame correspondence is typed MATCH
    # or SWITCH; num_matches counts MATCH rows ONLY, num_detections (which
    # feeds recall/precision/motp) counts both (metrics.py definitions of
    # the real package)
    num_misses = num_fp = num_switches = num_detections = 0
    num_fragmentations = 0
    num_transfer = num_ascend = num_migrate = 0
    ever_matched = set()     # gt ids that have been tracked at least once
    frag_pending = set()     # tracked -> untracked; counts on re-track
    dist_sum = 0.0
    gt_frames_per_track = {}
    tracked_frames_per_track = {}
    last_match_of_gt = {}    # gt id -> last matched pred id (across gaps)
    last_gt_of_pred = {}     # pred id -> last matched gt id (across gaps)

    for f in frames:
        gts = gt.get(f, {})
        prs = pred.get(f, {})
        for g in gts:
            gt_frames_per_track[g] = gt_frames_per_track.get(g, 0) + 1

        # distance matrix (squared euclidean), inf beyond threshold
        g_ids = list(gts)
        p_ids = list(prs)
        D = np.full((len(g_ids), len(p_ids)), np.inf)
        for i, g in enumerate(g_ids):
            for j, p in enumerate(p_ids):
                d = ((gts[g][0] - prs[p][0]) ** 2
                     + (gts[g][1] - prs[p][1]) ** 2)
                if d <= distth:
                    D[i, j] = d

        # 1) carry over the LAST-KNOWN correspondence per gt object —
        # persistent across frames where the object was absent or missed,
        # exactly like py-motmetrics' self.m (carrying only the previous
        # frame's matches re-matches reappearing objects from scratch and
        # counts spurious SWITCHes when a different hypothesis is closer)
        matches = {}
        for g, p in last_match_of_gt.items():
            if g in gts and p in prs:
                i, j = g_ids.index(g), p_ids.index(p)
                if np.isfinite(D[i, j]):
                    matches[g] = p
                    dist_sum += D[i, j]
                    D[i, :] = np.inf
                    D[:, j] = np.inf

        # 2) Hungarian on the remainder
        if D.size and np.isfinite(D).any():
            Dh = np.where(np.isfinite(D), D, 1e12)
            ri, ci = linear_sum_assignment(Dh)
            for i, j in zip(ri, ci):
                if np.isfinite(D[i, j]):
                    matches[g_ids[i]] = p_ids[j]
                    dist_sum += D[i, j]

        for g in g_ids:
            if g in matches:
                num_detections += 1
                tracked_frames_per_track[g] = \
                    tracked_frames_per_track.get(g, 0) + 1
                p = matches[g]
                # event taxonomy matching py-motmetrics (mot.py): a SWITCH
                # is the object side changing hypothesis, a TRANSFER the
                # hypothesis side changing object; ASCEND/MIGRATE are the
                # sub-cases where the new counterpart id was never matched
                is_switch = (g in last_match_of_gt
                             and last_match_of_gt[g] != p)
                is_transfer = (p in last_gt_of_pred
                               and last_gt_of_pred[p] != g)
                if is_switch:
                    num_switches += 1
                    if p not in last_gt_of_pred:
                        num_ascend += 1
                if is_transfer:
                    num_transfer += 1
                    if g not in last_match_of_gt:
                        num_migrate += 1
                last_match_of_gt[g] = p
                last_gt_of_pred[p] = g
                # re-tracked after an interruption -> one fragmentation
                if g in frag_pending:
                    num_fragmentations += 1
                    frag_pending.discard(g)
                ever_matched.add(g)
            else:
                num_misses += 1
                if g in ever_matched:
                    frag_pending.add(g)
        num_fp += len(p_ids) - len(set(matches.values()) & set(p_ids))

    num_gt = sum(gt_frames_per_track.values())
    num_pred = len(pred_df)

    # --- ID metrics: global trajectory LAP
    gt_tracks = {}
    for (f, oid), row in gt_df.iterrows():
        gt_tracks.setdefault(oid, {})[int(f)] = (float(row['X']),
                                                 float(row['Y']))
    pr_tracks = {}
    for (f, oid), row in pred_df.iterrows():
        pr_tracks.setdefault(oid, {})[int(f)] = (float(row['X']),
                                                 float(row['Y']))
    G, P_ = list(gt_tracks), list(pr_tracks)
    overlap = np.zeros((len(G), len(P_)))
    for i, g in enumerate(G):
        for j, p in enumerate(P_):
            n = 0
            for f, (gx, gy) in gt_tracks[g].items():
                if f in pr_tracks[p]:
                    px, py = pr_tracks[p][f]
                    if (gx - px) ** 2 + (gy - py) ** 2 <= distth:
                        n += 1
            overlap[i, j] = n
    # pad to square: unmatched = 0 overlap
    n = len(G) + len(P_)
    C = np.zeros((n, n))
    C[:len(G), :len(P_)] = -overlap
    ri, ci = linear_sum_assignment(C)
    idtp = int(-C[ri, ci].sum())
    idp = idtp / num_pred if num_pred else 0.0
    idr = idtp / num_gt if num_gt else 0.0
    idf1 = (2 * idtp / (num_gt + num_pred)) if (num_gt + num_pred) else 0.0

    # --- coverage
    mostly_tracked = partially_tracked = mostly_lost = 0
    for g, n_frames in gt_frames_per_track.items():
        ratio = tracked_frames_per_track.get(g, 0) / n_frames
        if ratio >= 0.8:
            mostly_tracked += 1
        elif ratio >= 0.2:
            partially_tracked += 1
        else:
            mostly_lost += 1

    mota = 1.0 - (num_misses + num_fp + num_switches) / num_gt \
        if num_gt else 0.0
    motp = dist_sum / num_detections if num_detections else 0.0
    recall = num_detections / num_gt if num_gt else 0.0
    precision = num_detections / num_pred if num_pred else 0.0

    return pd.Series({
        'num_frames': len(frames),
        'idf1': idf1, 'idp': idp, 'idr': idr,
        'recall': recall, 'precision': precision,
        'num_unique_objects': len(gt_tracks),
        'mostly_tracked': mostly_tracked,
        'partially_tracked': partially_tracked,
        'mostly_lost': mostly_lost,
        'num_false_positives': num_fp, 'num_misses': num_misses,
        'num_switches': num_switches,
        'num_fragmentations': num_fragmentations,
        'num_matches': num_detections - num_switches,
        'num_detections': num_detections,
        'num_transfer': num_transfer,
        'num_ascend': num_ascend,
        'num_migrate': num_migrate,
        'mota': mota, 'motp': motp,
    })
