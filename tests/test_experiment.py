"""End-to-end experiment runner test: run_experiment for 2 epochs in an
isolated OUTPUT_DIR (subprocess; config paths bind at import time), then
check run-dir artifacts and the evaluation drivers."""
import json
import os
import glob
import subprocess
import sys

import pytest

SCRIPT = r'''
import os, sys
sys.path.insert(0, {repo!r})
import jax
jax.config.update('jax_platforms', 'cpu')
from axtrack_tpu.params import get_default_parameters
from axtrack_tpu.data.synthetic import write_fixture
from axtrack_tpu.train.experiment import run_experiment

fx = write_fixture(os.environ['FIXDIR'], name='training_timelapse',
                   T=10, H=256, W=512, n_axons=4, seed=5, n_channels=4)
P = get_default_parameters()
P.update(dict(
    TIMELAPSE_FILE=fx['tif'], LABELS_FILE=fx['labels'], MASK_FILE=fx['mask'],
    TRAIN_TIMEPOINTS=list(range(2, 8)), TEST_TIMEPOINTS=[2, 3],
    TILESIZE=256, BATCH_SIZE=4, CACHE=None, FROM_CACHE=None,
    PLOT_PREPROC=True, USE_TRANSFORMS=[], LR=2e-3, EPOCHS=2,
    MODEL_CHECKPOINTS=(1,), PERF_LOG_VIDEO_KWARGS={{'animated': False,
                                                    'dpi': 50}},
    MCF_MIN_FLOW=1, MCF_MAX_FLOW=30,
    ARCHITECTURE=[
        [(3, 8, 2, 1), (3, 16, 2, 1), 'M', (3, 16, 1, 1), 'M'],
        [('FC', 128), ('activation', 'sigmoid')],
    ]))
run_experiment('exp_test', P, save_results=True)

# evaluation drivers on the finished run
from axtrack_tpu.utils.epochs import get_all_epoch_data
info, metrics = get_all_epoch_data('exp_test', 'run00', recreate=True)
assert len(info) == 2, info.shape      # epoch-indexed
from axtrack_tpu.evaluation import evaluate_training
evaluate_training([['exp_test', 'run00']], show=False, recreate=True)
print('EXPERIMENT_OK')
'''


def test_run_experiment_end_to_end(tmp_path):
    repo = os.path.abspath(os.path.dirname(os.path.dirname(__file__)))
    out_dir = str(tmp_path / 'out')
    fix_dir = str(tmp_path / 'fix')
    os.makedirs(fix_dir)
    env = dict(os.environ,
               AXTRACK_OUTPUT_DIR=out_dir, FIXDIR=fix_dir,
               JAX_PLATFORMS='cpu')
    script = SCRIPT.format(repo=repo)
    res = subprocess.run([sys.executable, '-c', script], env=env,
                         capture_output=True, text=True, timeout=900)
    assert 'EXPERIMENT_OK' in res.stdout, res.stdout[-3000:] + res.stderr[-3000:]

    run_dirs = glob.glob(f'{out_dir}/runs/exp_test/run00_*')
    assert len(run_dirs) == 1
    rd = run_dirs[0]
    with open(f'{rd}/params.json') as f:
        assert json.load(f)['EPOCHS'] == 2
    assert os.path.exists(f'{rd}/params.txt')
    # per-epoch metrics (pickle + csv), preproc samples, checkpoint at E1
    assert os.path.exists(f'{rd}/metrics/E0000.pkl')
    assert os.path.exists(f'{rd}/metrics/E0001.csv')
    assert glob.glob(f'{rd}/preproc_data/*_preproc_data.csv')
    assert os.path.isdir(f'{rd}/models/E0001')
    # checkpoint-epoch detection render dirs
    assert os.path.isdir(f'{rd}/metrics/0001_results')
    # training plot written by evaluate_training
    assert glob.glob(f'{rd}/training.*')


DEPLOY_SCRIPT = r'''
import os, sys
sys.path.insert(0, {repo!r})
import jax
jax.config.update('jax_platforms', 'cpu')
from axtrack_tpu.params import get_default_parameters
from axtrack_tpu.data.synthetic import write_fixture
from axtrack_tpu.train.experiment import run_experiment
from axtrack_tpu.interface import deploy_run, setup_inference

fx = write_fixture(os.environ['FIXDIR'], name='training_timelapse',
                   T=10, H=256, W=512, n_axons=4, seed=5, n_channels=4)
P = get_default_parameters()
P.update(dict(
    TIMELAPSE_FILE=fx['tif'], LABELS_FILE=fx['labels'], MASK_FILE=fx['mask'],
    TRAIN_TIMEPOINTS=list(range(2, 8)), TEST_TIMEPOINTS=[2, 3],
    TILESIZE=256, BATCH_SIZE=4, CACHE=os.environ['FIXDIR'], FROM_CACHE=None,
    PLOT_PREPROC=False, USE_TRANSFORMS=[], LR=2e-3, EPOCHS=2,
    MODEL_CHECKPOINTS=(1,), PERF_LOG_VIDEO_KWARGS={{'t_y_x_slice':
                                                    [(0, 1), None, None],
                                                    'dpi': 50}},
    ARCHITECTURE=[
        [(3, 8, 2, 1), (3, 16, 2, 1), 'M', (3, 16, 1, 1), 'M'],
        [('FC', 128), ('activation', 'sigmoid')],
    ]))
run_experiment('exp_dep', P, save_results=True)
bundle = deploy_run('exp_dep', 'run00', 1,
                    dest_dir=os.environ['BUNDLEDIR'])
params, model, scaler = setup_inference(os.environ['BUNDLEDIR'] + '/out',
                                        deployed_dir=bundle)
assert scaler[0] == 'zscore', scaler
print('DEPLOY_OK')
'''


def test_deploy_run_roundtrip(tmp_path):
    """deploy_run packages a finished run into a bundle that
    setup_inference can load (scaler found via the run's CACHE dir)."""
    repo = os.path.abspath(os.path.dirname(os.path.dirname(__file__)))
    env = dict(os.environ, AXTRACK_OUTPUT_DIR=str(tmp_path / 'out'),
               FIXDIR=str(tmp_path / 'fix'),
               BUNDLEDIR=str(tmp_path / 'bundle'), JAX_PLATFORMS='cpu')
    os.makedirs(env['FIXDIR'])
    res = subprocess.run([sys.executable, '-c',
                          DEPLOY_SCRIPT.format(repo=repo)], env=env,
                         capture_output=True, text=True, timeout=900)
    assert 'DEPLOY_OK' in res.stdout, \
        res.stdout[-2500:] + res.stderr[-2500:]
