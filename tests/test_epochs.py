"""Epoch-aggregation plumbing: cross-run stitching and MCF param writeback."""
import os

import numpy as np
import pandas as pd
import pytest

import axtrack_tpu.utils.epochs as EP
import axtrack_tpu.params as PR
import axtrack_tpu.utils.rundirs  # noqa: F401


def make_run(out_dir, exp, run_label, epochs, with_metrics=False):
    rd = f'{out_dir}/runs/{exp}/{run_label}'
    os.makedirs(f'{rd}/metrics', exist_ok=True)
    for e in epochs:
        cols = ['total_summed_loss', 'total_object_loss']
        if with_metrics and e % 10 == 0:
            cols += [('F1', 0.7), ('precision', 0.7)]
        df = pd.DataFrame(
            np.random.default_rng(e).random((2, len(cols))),
            index=pd.MultiIndex.from_tuples([(e, 'train'), (e, 'test')]),
            columns=cols)
        df.to_pickle(f'{rd}/metrics/E{e:0>4}.pkl')
    return rd


class TestEpochAggregation:
    def test_create_and_get(self, tmp_path, monkeypatch):
        out = str(tmp_path)
        monkeypatch.setattr(EP, 'OUTPUT_DIR', out)
        make_run(out, 'e1', 'run00_x', range(3))
        info, metrics = EP.get_all_epoch_data('e1', 'run00', recreate=True)
        assert list(info.index) == [0, 1, 2]
        assert ('total_summed_loss', 'train') in info.columns

    def test_best_f1_threshold_merged(self, tmp_path, monkeypatch):
        out = str(tmp_path)
        monkeypatch.setattr(EP, 'OUTPUT_DIR', out)
        make_run(out, 'e2', 'run00_x', [0, 10], with_metrics=True)
        info, metrics = EP.get_all_epoch_data('e2', 'run00', recreate=True)
        assert ('F1', 'test') in info.columns
        assert ('F1', 0.7, 'train') in metrics.columns

    def test_prepend_prev_run(self, tmp_path, monkeypatch):
        out = str(tmp_path)
        monkeypatch.setattr(EP, 'OUTPUT_DIR', out)
        make_run(out, 'e3', 'run00_x', range(3))
        make_run(out, 'e3', 'run01_x', range(2))
        EP.get_all_epoch_data('e3', 'run00', recreate=True)
        EP.get_all_epoch_data('e3', 'run01', recreate=True)
        EP.prepend_prev_run('e3', 'run00', 'run01')
        info, _ = EP.get_all_epoch_data('e3', 'run01',
                                        use_prepend_ifavail=True)
        assert list(info.index) == [0, 1, 2, 3, 4]   # 3 old + 2 shifted


class TestUpdateMCFParams:
    def test_writeback_best_combo(self, tmp_path, monkeypatch):
        out = str(tmp_path)
        monkeypatch.setattr(PR, 'OUTPUT_DIR', out)
        import axtrack_tpu.utils.rundirs as RD
        rd = f'{out}/runs/e4/run00_x'
        os.makedirs(f'{rd}/axon_dets', exist_ok=True)
        P = PR.get_default_parameters()
        PR.write_parameters(f'{rd}/params.json', P)
        res = pd.DataFrame({
            'edge_cost_thr': [0.4, 0.9], 'entry_exit_cost': [1.0, 2.0],
            'miss_rate': [0.6, 0.9], 'vis_sim_weight': [0.0, 0.1],
            'conf_capping_method': ['ceil', 'scale_to_max'],
            'idf1': [0.7, 0.95], 'mota': [0.6, 0.9]})
        res.to_csv(f'{rd}/axon_dets/MCF_params_results.csv')
        PR.update_MCF_params('e4', 'run00')
        P2 = PR.load_parameters('e4', 'run00')
        assert P2['MCF_EDGE_COST_THR'] == 0.9       # the higher-idf1 row
        assert P2['MCF_CONF_CAPPING_METHOD'] == 'scale_to_max'
