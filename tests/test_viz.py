"""Smoke tests for plotting/visualization helpers and misc utils."""
import os

import numpy as np
import pandas as pd
import pytest

import matplotlib
matplotlib.use('Agg')

from axtrack_tpu.viz.plots import (plot_preprocessed_input_data,
                                   plot_training_process, plot_prc_rcl,
                                   plot_IDassignment_performance)
from axtrack_tpu.viz.video import to_drawable
from axtrack_tpu.utils.profiling import StageTimer
from axtrack_tpu import config


class TestPlots:
    def test_preproc_plot(self, tmp_path, rng):
        cols = pd.MultiIndex.from_product(
            [['train', 'movie'], ['Original', 'Clipped'], ['t_0', 't_-1']])
        data = pd.DataFrame(rng.random((500, 8)), columns=cols)
        plot_preprocessed_input_data(data, name='x', dest_dir=str(tmp_path))
        assert (tmp_path / f'x_preprocessed_data.{config.FIGURE_FILETYPE}'
                ).exists()

    def test_training_plot(self, tmp_path, rng):
        cols = pd.MultiIndex.from_product(
            [['total_summed_loss', 'precision', 'recall', 'F1'],
             ['train', 'test']])
        df = pd.DataFrame(rng.random((30, 8)), columns=cols)
        plot_training_process({'run00': df}, dest_dir=str(tmp_path))
        assert (tmp_path / f'training.{config.FIGURE_FILETYPE}').exists()

    def test_prc_rcl_plot(self, tmp_path, rng):
        thrs = np.round(np.arange(0.55, 1, 0.04), 2)
        idx = pd.MultiIndex.from_product(
            [['precision', 'recall', 'F1'], thrs])
        ser = pd.Series(rng.random(len(idx)), index=idx)
        plot_prc_rcl({'E100': ser}, dest_dir=str(tmp_path))
        assert (tmp_path / f'prc_rcl.{config.FIGURE_FILETYPE}').exists()

    def test_id_assignment_plot(self, tmp_path, rng):
        res = pd.DataFrame({
            'edge_cost_thr': [.4, .7], 'entry_exit_cost': [1, 2],
            'miss_rate': [.6, .9], 'vis_sim_weight': [0, 0],
            'conf_capping_method': ['ceil', 'scale_to_max'],
            'idf1': [.8, .9], 'mota': [.7, .85],
            'mostly_tracked': [4, 5], 'partially_tracked': [1, 1]})
        plot_IDassignment_performance(res, dest_dir=str(tmp_path))
        assert (tmp_path / f'ID_assignment_performance.'
                           f'{config.FIGURE_FILETYPE}').exists()


class TestDrawable:
    def test_channel_fills(self):
        im1 = to_drawable(np.ones((1, 4, 4)) * 2)
        assert im1.shape == (4, 4, 3)
        assert im1[..., 0].max() == 1.0 and im1[..., 1].max() == 0
        im2 = to_drawable(np.ones((2, 4, 4)) * .5)
        assert im2[..., 0].max() == 0 and im2[..., 1].max() == .5


class TestProfiling:
    def test_stage_timer(self, tmp_path):
        import time
        t = StageTimer()
        with t.stage('a'):
            time.sleep(0.01)
        with t.stage('a'):
            time.sleep(0.01)
        s = t.summary()
        assert s['a']['calls'] == 2 and s['a']['total_s'] > 0.015
        t.dump(str(tmp_path / 'prof.json'))
        assert (tmp_path / 'prof.json').exists()
        assert 'a' in t.report()
