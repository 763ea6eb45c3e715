"""Epoch metric aggregation + cross-run stitching
(counterpart of reference utils.py:112-181)."""
import glob
import os

import pandas as pd

from ..config import OUTPUT_DIR
from .rundirs import get_run_dir


def create_all_epochs_info(metrics_dir):
    """Glue per-epoch pickles into loss_all_epochs / metrics_all_epochs
    (reference utils.py:112-131).

    Per-epoch files have rows (epoch, split) and mixed columns: plain loss
    names ('total_summed_loss', ...) plus threshold-sweep tuples
    (('F1', 0.7), ...) present every 10th epoch. Output: epoch-indexed
    frames — loss_all_epochs columns (loss_name, split) merged with the
    best-F1-threshold metrics (the reference selects the threshold with
    max mean test F1, utils.py:123-126); metrics_all_epochs columns
    (metric, thr, split)."""
    info_files = sorted(glob.glob(metrics_dir + '/E*.pkl'))
    info_files = [f for f in info_files if not f.endswith('_metrics.pkl')]
    rows = pd.concat([pd.read_pickle(E) for E in info_files], axis=0)
    info = rows.unstack(level=1)          # index epoch, cols (col, split)

    metric_cols = [c for c in info.columns if isinstance(c[0], tuple)]
    loss_cols = [c for c in info.columns if not isinstance(c[0], tuple)]
    all_epochs_info = info[loss_cols].copy()

    if metric_cols:
        metrics = info[metric_cols].copy()
        # columns ((metric, thr), split) -> (metric, thr, split)
        metrics.columns = pd.MultiIndex.from_tuples(
            [(c[0][0], c[0][1], c[1]) for c in metrics.columns])
        all_epochs_metrics = metrics
        try:
            f1_test = metrics.loc[:, ('F1', slice(None), 'test')]
            best_thr = f1_test.mean(0).idxmax()[1]
            best = metrics.loc[:, (slice(None), best_thr, slice(None))]
            best.columns = [(m, s) for (m, _t, s) in best.columns]
            best.columns = pd.MultiIndex.from_tuples(best.columns)
            all_epochs_info = pd.concat([all_epochs_info, best], axis=1)
        except (KeyError, ValueError):
            pass
    else:
        all_epochs_metrics = pd.DataFrame(index=info.index)

    all_epochs_info.to_pickle(f'{metrics_dir}/loss_all_epochs.pkl')
    all_epochs_metrics.to_pickle(f'{metrics_dir}/metrics_all_epochs.pkl')
    return all_epochs_info, all_epochs_metrics


def get_all_epoch_data(exp_name, run, recreate=False,
                       use_prepend_ifavail=True):
    """(reference utils.py:133-152)"""
    EXP_DIR = f'{OUTPUT_DIR}/runs/{exp_name}/'
    RUN_DIR = get_run_dir(EXP_DIR, run)

    info_fname = f'{RUN_DIR}/metrics/loss_all_epochs.pkl'
    metrics_fname = f'{RUN_DIR}/metrics/metrics_all_epochs.pkl'
    if use_prepend_ifavail:
        p_info = info_fname.replace('.pkl', '_prepend.pkl')
        p_metrics = metrics_fname.replace('.pkl', '_prepend.pkl')
        if os.path.exists(p_info):
            info_fname, metrics_fname = p_info, p_metrics

    if not os.path.exists(info_fname) or recreate:
        create_all_epochs_info(f'{RUN_DIR}/metrics/')
    return pd.read_pickle(info_fname), pd.read_pickle(metrics_fname)


def prepend_prev_run(exp_name, older_run, newer_run, older_run_until_e=None,
                     newer_run_until_e=None):
    """Stitch an older run's epoch history in front of a newer run's
    (resume-across-runs, reference utils.py:154-181)."""
    print(f'Prepending {older_run} to {newer_run} (<= output).')
    EXP_DIR = f'{OUTPUT_DIR}/runs/{exp_name}/'
    RUN_DIR = get_run_dir(EXP_DIR, newer_run)

    last_epoch = None
    old_info = old_metrics = None
    for i, (run, until_e) in enumerate(zip(
            (older_run, newer_run), (older_run_until_e, newer_run_until_e))):
        info, metrics = get_all_epoch_data(exp_name, run,
                                           use_prepend_ifavail=False)
        if until_e:
            info = info.loc[:until_e]
            metrics = metrics.loc[:until_e]
        if i == 0:
            last_epoch = info.index[-1]
            old_info, old_metrics = info, metrics
        else:
            info.index = info.index + last_epoch + 1
            metrics.index = metrics.index + last_epoch + 1
            info = pd.concat((old_info, info), sort=False)
            metrics = pd.concat((old_metrics, metrics), sort=False)
            info.to_pickle(f'{RUN_DIR}/metrics/loss_all_epochs_prepend.pkl')
            metrics.to_pickle(
                f'{RUN_DIR}/metrics/metrics_all_epochs_prepend.pkl')
