"""Parameter system + data-prep tooling tests."""
import numpy as np
import pytest

from axtrack_tpu.params import (get_default_parameters, write_parameters,
                                load_parameters, params2text,
                                check_parameters, compare_parameters,
                                to_device_specifc_params)


class TestParams:
    def test_default_key_set(self):
        """The 54-key surface of the reference parameter dict
        (deployed_model/params.txt:1-54 is ground truth)."""
        P = get_default_parameters()
        expected = {
            'TIMELAPSE_FILE', 'LABELS_FILE', 'MASK_FILE',
            'TRAIN_TIMEPOINTS', 'TEST_TIMEPOINTS', 'LOG_CORRECT',
            'PLOT_PREPROC', 'STANDARDIZE', 'STANDARDIZE_FRAMEWISE',
            'TEMPORAL_CONTEXT', 'USE_MOTION_DATA', 'USE_SPARSE',
            'USE_TRANSFORMS', 'CLIP_LOWERLIM', 'OFFSET', 'PAD', 'CACHE',
            'FROM_CACHE', 'SHUFFLE', 'DROP_LAST', 'ARCHITECTURE',
            'IMG_DIM', 'SY', 'SX', 'TILESIZE', 'ACTIVATION_FUNCTION',
            'NON_MAX_SUPRESSION_DIST', 'WEIGHT_DECAY', 'BATCH_SIZE',
            'EPOCHS', 'LOAD_MODEL', 'BBOX_THRESHOLD', 'LR', 'LR_DECAYRATE',
            'L_OBJECT', 'L_NOBJECT', 'L_COORD_ANCHOR', 'MCF_EDGE_COST_THR',
            'MCF_ENTRY_EXIT_COST', 'MCF_MISS_RATE', 'MCF_MAX_NUM_MISSES',
            'MCF_MIN_FLOW', 'MCF_MAX_FLOW', 'MCF_MAX_CONF_COST',
            'MCF_VIS_SIM_WEIGHT', 'MCF_CONF_CAPPING_METHOD', 'SEED',
            'DEVICE', 'NUM_WORKERS', 'PIN_MEMORY', 'NOTES',
            'MODEL_CHECKPOINTS', 'PERF_LOG_VIDEO_KWARGS'}
        assert expected <= set(P.keys())

    def test_key_values(self):
        P = get_default_parameters()
        assert (P['SY'], P['SX'], P['TILESIZE']) == (12, 12, 512)
        assert P['CLIP_LOWERLIM'] == 55 / 2 ** 16
        assert P['MCF_MIN_FLOW'] == 5 and P['MCF_MAX_FLOW'] == 450
        assert P['MODEL_CHECKPOINTS'] == (1, 250, 750, 1000, 1500)
        assert P['NON_MAX_SUPRESSION_DIST'] == 23

    def test_roundtrip_json(self, tmp_path):
        P = get_default_parameters()
        P['TRAIN_TIMEPOINTS'] = range(4, 33)
        write_parameters(str(tmp_path / 'params.json'), P)
        assert (tmp_path / 'params.txt').exists()
        P2 = load_parameters(None, None, from_directory=str(tmp_path))
        assert list(P2['TRAIN_TIMEPOINTS']) == list(range(4, 33))
        assert P2['ARCHITECTURE'][0][0] == (3, 20, 2, 1)
        assert P2['MODEL_CHECKPOINTS'] == (1, 250, 750, 1000, 1500)

    def test_check_parameters_rejects_unknown(self):
        P = get_default_parameters()
        with pytest.raises(ValueError):
            check_parameters({'BOGUS_KEY': 1}, P)
        check_parameters({'SEED': 1}, P)     # valid key passes

    def test_params2text_and_compare(self):
        P = get_default_parameters()
        text = params2text(P)
        assert 'SEED' in text and 'ARCHITECTURE' in text
        P2 = get_default_parameters()
        P2['SEED'] = 7
        diff = compare_parameters(P, P2)
        assert 'SEED' in diff

    def test_to_device_specific(self):
        P = get_default_parameters()
        P['TIMELAPSE_FILE'] = '/other/machine/path.tif'
        local = get_default_parameters()
        out = to_device_specifc_params(P, local, from_cache='/tmp/c')
        assert out['TIMELAPSE_FILE'] == local['TIMELAPSE_FILE']
        assert out['FROM_CACHE'] == '/tmp/c'


class TestDataPrep:
    def test_segment_background(self):
        from axtrack_tpu.data.prep import segment_background
        rng = np.random.default_rng(0)
        img = rng.normal(0.01, 0.003, (200, 300)).astype(np.float32)
        img[60:140, :] += 0.25            # bright channel band
        mask = segment_background(img, min_region_px=1000)
        # channel interior mostly captured, outside mostly not
        assert mask[70:130, 50:250].mean() > 0.8
        assert mask[:40].mean() < 0.2 and mask[160:].mean() < 0.2

    def test_construct_trainingdata(self, tmp_path):
        from axtrack_tpu.data.prep import construct_trainingdata
        from axtrack_tpu.data.synthetic import write_fixture
        from axtrack_tpu.data.tiffio import read_tiff
        import pandas as pd
        fx1 = write_fixture(str(tmp_path), name='m1', T=4, H=64, W=128,
                            n_axons=2, n_channels=2)
        fx2 = write_fixture(str(tmp_path), name='m2', T=3, H=64, W=128,
                            n_axons=2, n_channels=2, seed=1)
        out = construct_trainingdata(
            [fx1['tif'], fx2['tif']], [fx1['mask'], fx2['mask']],
            [fx1['labels'], fx2['labels']], str(tmp_path / 'out'))
        stack = read_tiff(out['tif'])
        assert stack.shape[0] == 7
        labels = pd.read_csv(out['labels'], index_col=0, header=[0, 1])
        assert len(labels) == 7

    def test_merge_noncontiguous_axon_ids(self):
        # two-labeller merges leave ID ranges non-contiguous (e.g. 0-1 and
        # 100-101); a count-based offset would renumber a later movie into
        # the gap and pd.concat would fuse two different axons' columns
        from axtrack_tpu.data.prep import merge_training_data
        import pandas as pd

        def lbl(ids, T):
            cols = pd.MultiIndex.from_tuples(
                [(f'Axon_{i:0>3}', a) for i in ids
                 for a in ('anchor_x', 'anchor_y')])
            return pd.DataFrame(np.ones((T, len(cols))), columns=cols)

        sig = np.zeros((2, 8, 8), np.float32)
        movie_a = lbl([0, 2, 100], 2)           # non-contiguous, max 100
        movie_b = lbl([0, 1], 2)
        _, _, merged = merge_training_data(
            [sig, sig], [None, None], [movie_a, movie_b])
        ids = merged.columns.unique(0)
        assert len(ids) == 5, ids               # no column fused two axons
        assert 'Axon_101' in ids and 'Axon_102' in ids
