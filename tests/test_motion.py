"""Motion-channel modes (USE_MOTION_DATA 'include'/'only') through the data
layer and model (deprecated in the reference but a supported capability,
Timelapse.py:328-368, core_functionality.py:62-67)."""
import numpy as np
import pytest
import jax.numpy as jnp

from axtrack_tpu.params import get_default_parameters
from axtrack_tpu.data.synthetic import write_fixture
from axtrack_tpu.data.timelapse import Timelapse
from axtrack_tpu.models.yolo import (build_model, init_variables,
                                     initial_in_channels, detect_axons)


@pytest.fixture(scope='module')
def fixture(tmp_path_factory):
    d = tmp_path_factory.mktemp('motion')
    return write_fixture(str(d), T=8, H=256, W=256, n_axons=2, seed=2,
                         n_channels=2)


def make_ds(fixture, mode):
    return Timelapse(
        imseq_path=fixture['tif'], labels_csv=fixture['labels'],
        mask_path=fixture['mask'], timepoints=None, offset=None,
        log_correct=True, standardize_framewise=False,
        standardize=('zscore', None), name='test',
        use_motion_filtered=mode, use_transforms=[], contrast_llim=None,
        plot=False, pad=None, Sy=12, Sx=12, tilesize=256, cache=None,
        from_cache=None, temporal_context=2)


class TestMotionModes:
    @pytest.mark.parametrize('mode,ncol', [('include', 3), ('only', 2)])
    def test_tiles_have_motion_channels(self, fixture, mode, ncol):
        ds = make_ds(fixture, mode)
        assert ds.p_motion_seq is not None
        ds.construct_tiles(force_no_transformation=True)
        X, tgt = ds[0]
        assert X.shape[-1] == 5 * ncol
        Xs, _ = ds.get_frametiles_stack(0)
        assert Xs.shape[-1] == 5 * ncol
        # motion of frame 0 is zeros; later frames nonzero where blobs move
        assert np.asarray(ds.p_motion_seq[3:]).max() > 0

    def test_model_channel_plumbing(self, fixture):
        P = get_default_parameters()
        P['USE_MOTION_DATA'] = 'include'
        P['TILESIZE'] = 256
        P['ARCHITECTURE'] = [
            [(3, 8, 2, 1), 'M'], [('FC', 32), ('activation', 'sigmoid')]]
        assert initial_in_channels(P) == 15
        model = build_model(P)
        variables = init_variables(model, P, seed=0)
        ds = make_ds(fixture, 'include')
        ds.construct_tiles(force_no_transformation=True)
        X, _ = ds.get_frametiles_stack(0)
        grid = detect_axons(model, variables, X)
        assert grid.shape[1:] == (12, 12, 3)


class TestMotionTraining:
    def test_gather_batch_matches_getitem_motion(self, fixture):
        """Batch gathering must preserve the frame-major channel layout
        in motion modes (matches __getitem__)."""
        from axtrack_tpu.train.engine import gather_batch
        ds = make_ds(fixture, 'include')
        ds.construct_tiles(force_no_transformation=True)
        idx = np.array([0, len(ds) - 1])
        X, tgt = gather_batch(ds, idx)
        for k, i in enumerate(idx):
            Xi, ti = ds[int(i)]
            np.testing.assert_array_equal(X[k], Xi)
            np.testing.assert_array_equal(tgt[k], ti)
