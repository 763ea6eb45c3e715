"""Min-cost-flow cost models.

Reimplements reference axtrack/mincostflow_models.py:6-119 with vectorized
numpy/jnp instead of per-box cv2 loops. The appearance histogram +
Bhattacharyya similarity replaces cv2.calcHist/compareHist
(mincostflow_models.py:62-111); weight 0 by default (MCF_VIS_SIM_WEIGHT=0,
exp_parameters.py:90).
"""
import numpy as np


def observation_costs(scores, max_conf_cost):
    """Confidence -> log-odds observation cost, clamped to +-max_conf_cost
    (mincostflow_models.py:19-27). Confident detections get negative cost
    (a reward for covering them)."""
    scores = np.asarray(scores, np.float64)
    beta = (scores - 1) * -1 + 1e-6          # conf -> miss probability
    cost = np.log(beta / (1 - beta))
    return np.clip(cost, -max_conf_cost, max_conf_cost)


def box_histogram_features(image, boxes_xywh, n_bins=180):
    """Per-box grayscale histogram appearance features
    (mincostflow_models.py:45-65). image: f32[H, W] in model units; boxes:
    i32[N, 4] (x, y, w, h) top-left. Returns f32[N, n_bins] minmax-normalized.
    """
    boxes = np.atleast_2d(np.asarray(boxes_xywh, np.int64))
    n = len(boxes)
    feats = np.zeros((n, n_bins), np.float32)
    if n == 0:
        return feats
    H, W = image.shape
    for i, (x, y, w, h) in enumerate(boxes):
        y1, x1 = max(int(y), 0), max(int(x), 0)
        y2 = max(y1 + 1, min(int(y) + int(h), H))
        x2 = max(x1 + 1, min(int(x) + int(w), W))
        crop = np.asarray(image[y1:y2, x1:x2], np.float32)
        hist, _ = np.histogram(crop, bins=n_bins, range=(0.0, 1.0))
        hist = hist.astype(np.float32)
        rng = hist.max() - hist.min()
        if rng > 0:
            hist = (hist - hist.min()) / rng
        feats[i] = hist
    return feats


def bhattacharyya_similarity(feats_a, feats_b):
    """1 - Bhattacharyya distance matrix (cv2.HISTCMP_BHATTACHARYYA
    convention: d = sqrt(1 - sum(sqrt(a*b)) / sqrt(mean(a)*mean(b)*N^2)))."""
    a = np.asarray(feats_a, np.float64)
    b = np.asarray(feats_b, np.float64)
    if len(a) == 0 or len(b) == 0:
        return np.zeros((len(a), len(b)))
    n = a.shape[1]
    cross = np.sqrt(a)[:, None, :] * np.sqrt(b)[None, :, :]
    num = cross.sum(-1)
    denom = np.sqrt(a.mean(1)[:, None] * b.mean(1)[None, :]) * n
    with np.errstate(divide='ignore', invalid='ignore'):
        bc = np.where(denom > 0, num / denom, 0.0)
    d = np.sqrt(np.clip(1.0 - bc, 0.0, None))
    return np.nan_to_num(1.0 - d)


def transition_costs(astar_dists, miss_rate, time_gap, max_px_assoc_dist,
                     vis_sim=None, vis_sim_weight=0.0):
    """Track->detection transition cost matrix
    (mincostflow_models.py:100-119).

    astar_dists: f32[N_prev, N_cur] node-count distances, with
    max_px_assoc_dist marking unreachable. Returns f32[N_prev, N_cur] with
    np.inf on unreachable pairs.
    """
    d = np.asarray(astar_dists, np.float64)
    closeness = (d / max_px_assoc_dist - 1) * -1       # 1 best, 0 unreachable
    inf_dist = closeness == 0
    if vis_sim is None:
        vis_sim = np.zeros_like(closeness)
    costs = -np.log((1 - vis_sim_weight) * closeness
                    * (miss_rate ** (time_gap - 1))
                    + vis_sim_weight * np.asarray(vis_sim)
                    + 1e-6)
    costs[inf_dist] = np.inf
    return costs


def cap_confidences(confs, method):
    """Confidence capping before observation costs
    (AxonDetections.py:655-659): 'ceil' clamps at 1, 'scale_to_max' divides
    by the global max."""
    confs = np.asarray(confs, np.float64).copy()
    if len(confs) == 0:
        return confs
    if method == 'ceil':
        confs[confs > 1] = 1
    elif method == 'scale_to_max':
        confs /= confs.max()
    else:
        raise ValueError(f'unknown capping method {method!r}')
    return confs


def observation_setup(frame_dets, params):
    """Shared per-detection cost preamble for every tracker variant.

    (obs_all, offsets, counts): flattened observation costs over all
    frames' detections (confidences capped per MCF_CONF_CAPPING_METHOD),
    the per-frame offset table into that flat array, and per-frame counts.
    One definition keeps the exact MCF path (tracker.assign_identities)
    and the online trackers (lap_device) from drifting apart.
    """
    counts = [len(fd['conf']) for fd in frame_dets]
    offsets = np.concatenate([[0], np.cumsum(counts)]).astype(int)
    n_dets = int(offsets[-1])
    all_conf = np.concatenate(
        [np.asarray(fd['conf'], np.float64) for fd in frame_dets]) \
        if n_dets else np.zeros(0)
    capped = cap_confidences(all_conf, params['MCF_CONF_CAPPING_METHOD'])
    obs_all = observation_costs(capped, params['MCF_MAX_CONF_COST'])
    return obs_all, offsets, counts
