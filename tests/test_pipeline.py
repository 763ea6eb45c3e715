"""End-to-end pipeline tests on synthetic fixtures with an oracle detector
(decouples decode/NMS/geodesic/MCF correctness from detector training)."""
import numpy as np
import pandas as pd
import pytest

from axtrack_tpu.params import get_default_parameters
from axtrack_tpu.data.synthetic import write_fixture, OracleDetector
from axtrack_tpu.data.timelapse import Timelapse
from axtrack_tpu.detections import AxonDetections


@pytest.fixture(scope='module')
def fixture(tmp_path_factory):
    d = tmp_path_factory.mktemp('fix')
    # one axon per channel -> no two axons ever share a YOLO cell
    return write_fixture(str(d), T=12, H=512, W=768, n_axons=6, seed=3,
                         n_channels=6)


@pytest.fixture(scope='module')
def params():
    P = get_default_parameters()
    P['TILESIZE'] = 256
    P['MCF_MIN_FLOW'] = 1
    P['MCF_MAX_FLOW'] = 50
    return P


@pytest.fixture(scope='module')
def dataset(fixture, params):
    return Timelapse(
        imseq_path=fixture['tif'], labels_csv=fixture['labels'],
        mask_path=fixture['mask'], timepoints=None, offset=None,
        log_correct=True, standardize_framewise=False,
        standardize=('zscore', None), name='test',
        use_transforms=[], contrast_llim=None, plot=True, pad=None,
        Sy=12, Sx=12, tilesize=params['TILESIZE'], cache=None,
        from_cache=None, temporal_context=2)


class TestTimelapse:
    def test_shapes_and_slicing(self, dataset, fixture):
        T = 12
        assert dataset.sizet == T - 4            # context trims 2 each side
        assert dataset.sizey == 512 and dataset.sizex == 768
        assert dataset.X.shape == (T, 512, 768)  # all frames incl context
        assert dataset.timepoints == list(range(2, T - 2))

    def test_standardization_used_nonzero_stats(self, dataset):
        kind, (var, mean) = dataset.stnd_scaler
        assert kind == 'zscore' and var > 0

    def test_construct_tiles(self, dataset, params):
        dataset.construct_tiles(force_no_transformation=True)
        T_all, K, ts, ts2 = dataset.X_tiled.shape
        assert ts == ts2 == params['TILESIZE']
        assert K <= dataset.ytiles * dataset.xtiles
        assert dataset.target_tiled.shape == (T_all, K, 12, 12, 4)
        # positive cells = unique (tile, cell) among the 6 axons (two axons
        # in one cell collapse to one positive — scatter overwrite, same as
        # the reference's sparse-tensor trick at Timelapse.py:486-489)
        ts = params['TILESIZE']
        npos = dataset.target_tiled[..., 0].sum((1, 2, 3))
        lab = dataset.target
        for row, n in zip(range(len(lab)), npos):
            cells = set()
            for name in lab.columns.unique(0):
                y = lab.iloc[row][(name, 'anchor_y')]
                x = lab.iloc[row][(name, 'anchor_x')]
                cells.add((int(y // ts), int(x // ts),
                           int(y % ts / ts * 12), int(x % ts / ts * 12)))
            assert n == len(cells), (row, n, cells)

    def test_big_movie_chunked_path_matches_device_path(self, dataset):
        """Movies beyond the device budget stream through the device in
        frame chunks with host-resident X_tiled; the result must equal the
        whole-movie device path bit for bit."""
        import jax
        dataset.construct_tiles(force_no_transformation=True)
        dev_tiles = np.asarray(dataset.X_tiled)
        dev_targets = np.asarray(dataset.target_tiled)
        dev_idx = np.asarray(dataset._tile_flat_idx)
        assert isinstance(dataset.X_tiled, jax.Array)
        old = dataset._DEVICE_MOVIE_BUDGET
        try:
            dataset._DEVICE_MOVIE_BUDGET = 1  # force the chunked path
            dataset._tiles_clean = False      # defeat the clean-reuse skip
            dataset.construct_tiles(force_no_transformation=True)
        finally:
            dataset._DEVICE_MOVIE_BUDGET = old
        assert isinstance(dataset.X_tiled, np.ndarray)   # host-resident
        np.testing.assert_array_equal(dev_idx,
                                      np.asarray(dataset._tile_flat_idx))
        np.testing.assert_array_equal(dev_tiles, dataset.X_tiled)
        np.testing.assert_array_equal(dev_targets,
                                      np.asarray(dataset.target_tiled))
        dataset._tiles_clean = False
        dataset.construct_tiles(force_no_transformation=True)  # restore

    def test_getitem_stacks_context(self, dataset):
        X, tgt = dataset[0]
        assert X.shape == (256, 256, 5)
        assert tgt.shape == (12, 12, 4)

    def test_frametiles_stack(self, dataset):
        X, tgt = dataset.get_frametiles_stack(0)
        assert X.ndim == 4 and X.shape[-1] == 5
        assert tgt.shape[1:] == (12, 12, 4)


class TestOracleDetections:
    @pytest.fixture(scope='class')
    def axdets(self, dataset, params, tmp_path_factory):
        d = tmp_path_factory.mktemp('dets')
        oracle = OracleDetector(dataset, conf=0.95, noise_cells=0)
        ax = AxonDetections(oracle, dataset, params, str(d))
        ax.detect_dataset()
        return ax

    def test_detections_match_groundtruth(self, axdets, dataset):
        for t in range(len(axdets)):
            det = axdets.get_frame_dets('all', t)
            gt = axdets.get_frame_dets('groundtruth', t)
            assert len(det) == len(gt) == 6
            # same coordinates (decode of oracle grid == decode of GT grid)
            got = set(map(tuple, det[['anchor_x', 'anchor_y']].values))
            want = set(map(tuple, gt[['anchor_x', 'anchor_y']].values))
            assert got == want

    def test_metrics_perfect(self, axdets):
        cnfs = sum(axdets.compute_TP_FP_FN('all', t)
                   for t in range(len(axdets)))
        prc_rcl_f1 = axdets.compute_prc_rcl_F1(cnfs)
        # at the operating threshold 0.7 (oracle conf 0.95): perfect
        idx = np.where(axdets.all_conf_thrs == 0.7)[0][0]
        assert (prc_rcl_f1[:, idx] == 1.0).all()

    def test_assign_ids_tracks_all_axons(self, axdets):
        axdets.assign_ids()
        dets_all = axdets.IDed_dets_all
        assert dets_all is not None
        assert len(dets_all) == 6                # one row per axon
        # every axon tracked through every frame
        for t in range(len(axdets)):
            assert dets_all[t].dropna().shape[0] == 6

    def test_track_identity_consistency(self, axdets, dataset, fixture):
        """Tracked positions per ID must follow one ground-truth axon."""
        labels = fixture['labels_df']
        dets_all = axdets.IDed_dets_all
        tps = dataset.timepoints
        for axon_id in dets_all.index:
            # which GT axon is this track closest to, per frame
            matches = []
            for t in range(len(axdets)):
                x = dets_all.loc[axon_id, (t, 'anchor_x')]
                y = dets_all.loc[axon_id, (t, 'anchor_y')]
                gt_row = labels.iloc[tps[t]]
                dists = {}
                for name in labels.columns.unique(0):
                    gy = gt_row[(name, 'anchor_y')]
                    gx = gt_row[(name, 'anchor_x')]
                    dists[name] = np.hypot(gy - y, gx - x)
                matches.append(min(dists, key=dists.get))
            assert len(set(matches)) == 1, f'{axon_id} switched: {matches}'

    def test_ided_dets_schema(self, axdets):
        dets_all = axdets.IDed_dets_all
        assert dets_all.index.name == 'axonID'
        assert dets_all.columns.names == ['frameID', 'detInfo']
        assert list(dets_all[0].columns) == ['anchor_x', 'anchor_y', 'conf']

    def test_cache_roundtrip(self, axdets, dataset, params, tmp_path_factory):
        d = tmp_path_factory.mktemp('cache')
        oracle = OracleDetector(dataset, conf=0.95)
        ax1 = AxonDetections(oracle, dataset, params, str(d))
        ax1.detect_dataset(cache='to')
        ax1.assign_ids(astar_paths_cache='to', assigedIDs_cache='to')
        ax2 = AxonDetections(oracle, dataset, params, str(d))
        ax2.detect_dataset(cache='from')
        ax2.assign_ids(astar_paths_cache='from', assigedIDs_cache='from')
        pd.testing.assert_frame_equal(ax1.IDed_dets_all, ax2.IDed_dets_all)

    def test_libmot_roundtrip(self, axdets):
        lm = axdets.get_frame_dets('IDed', 0, libmot=True)
        assert list(lm.columns) == ['X', 'Y', 'Width', 'Height', 'conf']
        assert (lm['Width'] == 70).all()


class TestNoiseRobustness:
    def test_distractors_suppressed_by_tracking(self, dataset, params,
                                                tmp_path_factory):
        """Low-conf distractor detections should mostly not obtain IDs."""
        d = tmp_path_factory.mktemp('noise')
        oracle = OracleDetector(dataset, conf=0.95, noise_cells=4,
                                noise_conf=0.6, seed=1)
        ax = AxonDetections(oracle, dataset, params, str(d))
        ax.detect_dataset()
        ax.assign_ids()
        # 6 real axons with long tracks; distractors at conf .6 are isolated
        long_tracks = (ax.IDed_dets_all.notna()
                       .T.groupby(level=0).all().sum() > len(ax) // 2).sum()
        assert long_tracks == 6


class TestMCFParamSearch:
    def test_mini_grid_search(self, dataset, params, tmp_path_factory):
        """search_MCF_params over a tiny grid writes MCF_params_results.csv
        with MOT metrics per combo (reference AxonDetections.py:845-922)."""
        import os
        import pandas as pd
        from axtrack_tpu.data.synthetic import OracleDetector
        from axtrack_tpu.detections import AxonDetections
        d = tmp_path_factory.mktemp('mcfsearch')
        oracle = OracleDetector(dataset, conf=0.95)
        ax = AxonDetections(oracle, dataset, params, str(d))
        ax.detect_dataset()
        ax.assign_ids(astar_paths_cache='to')     # seed the 'from' cache
        res = ax.search_MCF_params(
            edge_cost_thr_values=[0.7], entry_exit_cost_values=[1, 2],
            miss_rate_values=[0.6], vis_sim_weight_values=[0],
            conf_capping_method_values=['scale_to_max'])
        assert os.path.exists(os.path.join(str(d), 'MCF_params_results.csv'))
        assert len(res) == 2
        assert {'idf1', 'mota', 'edge_cost_thr'} <= set(res.columns)
        # oracle detections -> near-perfect tracking for sane params
        assert res['idf1'].max() > 0.95

    def test_parallel_equals_sequential(self, dataset, params,
                                        tmp_path_factory):
        """The fanned-out grid must reproduce the sequential loop exactly."""
        import pandas as pd
        from axtrack_tpu.data.synthetic import OracleDetector
        from axtrack_tpu.detections import AxonDetections
        d = tmp_path_factory.mktemp('mcfsearch_par')
        oracle = OracleDetector(dataset, conf=0.95)
        ax = AxonDetections(oracle, dataset, params, str(d))
        ax.detect_dataset()
        ax.assign_ids(astar_paths_cache='to')
        kw = dict(edge_cost_thr_values=[0.7, 1.0],
                  entry_exit_cost_values=[1],
                  miss_rate_values=[0.6], vis_sim_weight_values=[0],
                  conf_capping_method_values=['ceil', 'scale_to_max'])
        seq = ax.search_MCF_params(n_jobs=1, **kw)
        par = ax.search_MCF_params(n_jobs=4, **kw)
        pd.testing.assert_frame_equal(seq, par)


class TestAccessorPaths:
    @pytest.fixture(scope='class')
    def axdets(self, dataset, params, tmp_path_factory):
        from axtrack_tpu.data.synthetic import OracleDetector
        d = tmp_path_factory.mktemp('acc')
        oracle = OracleDetector(dataset, conf=0.95)
        ax = AxonDetections(oracle, dataset, params, str(d))
        ax.detect_dataset()
        return ax

    def test_fp_fn_masks(self, axdets):
        FP, FN = axdets.get_frame_dets('FP_FN', 0)
        # oracle detections: no false positives/negatives at thr 0.7
        assert len(FP) == 0 and len(FN) == 0

    def test_unstitched_views(self, axdets, dataset):
        tiles = axdets.get_frame_dets('all', 0, unstitched=True)
        assert len(tiles) == dataset.X_tiled.shape[1]
        # unstitched coords are tile-local
        for sub in tiles:
            if len(sub):
                assert (sub['anchor_x'] < dataset.tilesize).all()
                assert (sub['anchor_y'] < dataset.tilesize).all()
        # stitching back distributes all detections
        assert sum(len(s) for s in tiles) == 6

    def test_frame_and_truedets_unstitched(self, axdets):
        X, tiled_true = axdets.get_frame_and_truedets(0, unstitched=True)
        assert X.ndim == 4
        assert sum(len(s) for s in tiled_true) == 6

    def test_detection_metrics_accessor(self, axdets):
        prc, rcl, f1 = axdets.get_detection_metrics('all', 0)
        assert (prc, rcl, f1) == (1.0, 1.0, 1.0)
        allm = axdets.get_detection_metrics('all', 0,
                                            return_all_conf_thrs=True)
        assert allm.shape == (3, 13)

    def test_reconstruction_stubs(self, axdets):
        from axtrack_tpu.detections import (_reconstruct_axons,
                                            get_axon_reconstructions)
        with pytest.raises(NotImplementedError):
            _reconstruct_axons(axdets)
        with pytest.raises(NotImplementedError):
            get_axon_reconstructions(axdets)


class TestOnlineTrackerAgreement:
    def test_online_matches_mcf_on_oracle(self, dataset, params,
                                          tmp_path_factory):
        """On clean oracle detections, the on-device online tracker and the
        exact MCF produce the same long-track structure."""
        from axtrack_tpu.data.synthetic import OracleDetector
        d = tmp_path_factory.mktemp('online')
        oracle = OracleDetector(dataset, conf=0.95)
        ax = AxonDetections(oracle, dataset, params, str(d))
        ax.detect_dataset()
        ax.assign_ids(astar_paths_cache='to', method='mcf')
        mcf_all = ax.IDed_dets_all.copy()
        ax.assign_ids(astar_paths_cache='from', method='online')
        onl_all = ax.IDed_dets_all
        # both track all 6 axons through every frame
        assert len(onl_all) == len(mcf_all) == 6
        # positions per frame agree as sets (ID numbering may differ)
        for t in range(len(ax)):
            a = set(map(tuple, mcf_all[t].dropna()[
                ['anchor_x', 'anchor_y']].values))
            b = set(map(tuple, onl_all[t].dropna()[
                ['anchor_x', 'anchor_y']].values))
            assert a == b


class TestFusedAssocProgram:
    def test_fused_pallas_flush_matches_lax_path(self, params, monkeypatch,
                                                 tmp_path_factory):
        """The production flush's FUSED Pallas program (chamfer maps +
        certificate + pair gathers in one jit, TPU hot path) produces the
        same astar_dists as the lax doubling-wrapper path. Runs the Mosaic
        kernel in interpret mode on a small fixture (window is capped by
        the frame size, so the interpret sweep stays cheap)."""
        import functools
        from axtrack_tpu.ops import geodesic as G
        from axtrack_tpu.ops import geodesic_pallas as GP

        d = tmp_path_factory.mktemp('fused')
        fx = write_fixture(str(d), T=6, H=256, W=256, n_axons=4, seed=7,
                           n_channels=4)
        ds = Timelapse(
            imseq_path=fx['tif'], labels_csv=fx['labels'],
            mask_path=fx['mask'], timepoints=None, offset=None,
            log_correct=True, standardize_framewise=False,
            standardize=('zscore', None), name='fused',
            use_transforms=[], contrast_llim=None, plot=False, pad=None,
            Sy=6, Sx=6, tilesize=64, cache=None, from_cache=None,
            temporal_context=2)
        P = dict(params, TILESIZE=64, SY=6, SX=6)
        oracle = OracleDetector(ds, conf=0.95, noise_cells=0)

        ax = AxonDetections(oracle, ds, P, None)
        ax.detect_dataset()
        ref = ax._compute_detections_astar_dists()    # lax path on CPU

        # force the Pallas branch of the flush, in interpret mode
        monkeypatch.setattr(G, 'use_pallas_backend', lambda: True)
        monkeypatch.setattr(
            GP, 'batched_windows_probed',
            functools.partial(GP.batched_windows_probed.__wrapped__,
                              interpret=True))
        got = ax._compute_detections_astar_dists()
        assert set(got) == set(ref)
        for k in ref:
            assert np.array_equal(np.asarray(got[k]), np.asarray(ref[k])), k
