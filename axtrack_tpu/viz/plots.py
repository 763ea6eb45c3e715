"""Training / evaluation plots.

Counterpart of reference axtrack/ml_plotting.py:9-341: preprocessing
distribution check, training curves with EWM smoothing, precision/recall
curves, and ID-assignment (MCF search) performance plots.
"""
import os

import numpy as np
import pandas as pd
import matplotlib.pyplot as plt

from .. import config


def plot_preprocessed_input_data(data, name='', notes='', dest_dir=None,
                                 show=False, fname_postfix=''):
    """Pixel-intensity histograms per preprocessing step, dataset overlayed
    (reference ml_plotting.py:9-92). ``data``: columns MultiIndex
    (dataset, step, {t_0, t_-1})."""
    steps = list(dict.fromkeys(data.columns.get_level_values(1)))
    fig, axes = plt.subplots(1, max(len(steps), 1),
                             figsize=config.LARGE_FIGSIZE, sharey=True)
    axes = np.atleast_1d(axes)
    datasets = list(dict.fromkeys(data.columns.get_level_values(0)))
    for ax, step in zip(axes, steps):
        for ds_i, ds in enumerate(datasets):
            for t_lbl, style in (('t_0', '-'), ('t_-1', ':')):
                col = (ds, step, t_lbl)
                if col not in data.columns:
                    continue
                vals = data[col].dropna().values
                vals = vals[vals > 0]
                if not len(vals):
                    continue
                hist, edges = np.histogram(vals, bins=80)
                ax.plot(edges[:-1], hist / max(hist.max(), 1),
                        style, label=f'{ds} {t_lbl}',
                        color=config.DEFAULT_COLORS[ds_i % 10], alpha=.8)
        ax.set_title(step, fontsize=config.SMALL_FONTS)
        ax.set_yscale('symlog', linthresh=1e-3)
    axes[0].legend(fontsize=7)
    fig.suptitle(f'{name} preprocessing {notes}')
    if dest_dir:
        fname = f'{dest_dir}/{name}_preprocessed_data{fname_postfix}.' \
                f'{config.FIGURE_FILETYPE}'
        fig.savefig(fname)
    if show:
        plt.show()
    plt.close(fig)


def plot_training_process(training, dest_dir=None, show=False):
    """Loss + metric curves over epochs for one or more runs
    (reference ml_plotting.py:94-167). ``training``: dict label ->
    DataFrame indexed by epoch with (metric, split) columns."""
    metrics = ['total_summed_loss', 'total_object_loss',
               'total_no_object_loss', 'total_xy_anchors_loss',
               'precision', 'recall', 'F1', 'total_pos_labels_rate']
    fig, axes = plt.subplots(2, 4, figsize=config.LARGE_FIGSIZE)
    for m_i, (metric, ax) in enumerate(zip(metrics, axes.ravel())):
        for r_i, (lbl, df) in enumerate(training.items()):
            color = config.DEFAULT_COLORS[r_i % 10]
            for split, kwargs in (('train', config.TRAIN_Ps),
                                  ('test', config.TEST_Ps)):
                col = (metric, split) if (metric, split) in df.columns \
                    else metric if metric in df.columns else None
                if col is None:
                    continue
                series = df[col].dropna()
                if isinstance(series, pd.DataFrame):
                    series = series.iloc[:, 0]
                if not len(series):
                    continue
                smooth = series.ewm(span=15).mean()
                ax.plot(smooth.index, smooth.values, color=color,
                        label=f'{lbl} {split}' if m_i == 0 else None,
                        **kwargs)
        ax.set_title(metric, fontsize=config.SMALL_FONTS)
    axes[0, 0].legend(fontsize=6)
    fig.tight_layout()
    if dest_dir:
        fig.savefig(f'{dest_dir}/training.{config.FIGURE_FILETYPE}')
    if show:
        plt.show()
    plt.close(fig)


def plot_prc_rcl(metrics, dest_dir=None, show=False):
    """Precision-recall curves over confidence thresholds
    (reference ml_plotting.py:169-237). ``metrics``: dict label -> Series
    with (metric, thr) MultiIndex."""
    fig, ax = plt.subplots(figsize=config.MEDIUM_FIGSIZE)
    for i, (lbl, ser) in enumerate(metrics.items()):
        try:
            prc = ser['precision']
            rcl = ser['recall']
        except KeyError:
            continue
        ax.plot(rcl.values, prc.values, 'o-', label=lbl,
                color=config.DEFAULT_COLORS[i % 10], alpha=.8)
    ax.set_xlabel('recall')
    ax.set_ylabel('precision')
    ax.set_xlim(0, 1.05)
    ax.set_ylim(0, 1.05)
    ax.legend(fontsize=7)
    if dest_dir:
        fig.savefig(f'{dest_dir}/prc_rcl.{config.FIGURE_FILETYPE}')
    if show:
        plt.show()
    plt.close(fig)


def plot_IDassignment_performance(results, dest_dir=None, show=False,
                                  col_param=None):
    """MCF-param-search results: idf1/mota scatter + mostly-tracked bars
    (reference ml_plotting.py:239-341)."""
    fig, (ax1, ax2) = plt.subplots(1, 2, figsize=config.LARGE_FIGSIZE)
    colors = config.DEFAULT_COLORS
    if col_param and col_param in results.columns:
        groups = list(results.groupby(col_param))
    else:
        groups = [('all', results)]
    for i, (lbl, grp) in enumerate(groups):
        ax1.scatter(grp['mota'], grp['idf1'], s=14, alpha=.7,
                    color=colors[i % 10], label=str(lbl))
    ax1.set_xlabel('MOTA')
    ax1.set_ylabel('IDF1')
    ax1.legend(fontsize=7)

    best = results.sort_values(['idf1', 'mota'], ascending=False).head(10)
    idx = np.arange(len(best))
    for j, key in enumerate(('mostly_tracked', 'partially_tracked')):
        if key in best.columns:
            ax2.bar(idx + j * .4, best[key].values, width=.4,
                    color=colors[j], label=key)
    ax2.set_xlabel('top-10 param combos (by IDF1)')
    ax2.legend(fontsize=7)
    if dest_dir:
        fig.savefig(f'{dest_dir}/ID_assignment_performance.'
                    f'{config.FIGURE_FILETYPE}')
    if show:
        plt.show()
    plt.close(fig)
