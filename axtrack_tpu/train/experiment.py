"""Experiment driver — retraining entry point.

TPU-native rebuild of reference experiment/experiment.py:49-157:
run_experiment / optimize / save_epoch_results / optimize_MCF_params.
Epoch metrics are persisted as JSON-friendly pickles per epoch (E%04d.pkl,
pandas) for parity with the evaluation tooling.
"""
import os
import time

import pandas as pd

from .. import config
from ..params import (get_default_parameters, write_parameters,
                      check_parameters, params2text, load_parameters,
                      to_device_specifc_params)
from ..utils import set_seed, create_logging_dirs, save_preproc_metrics
from ..utils.rundirs import get_run_dir
from . import engine
from .checkpoint import save_checkpoint
from ..detections import AxonDetections


def run_experiment(exp_name, parameters, save_results=True, mesh=None):
    """(reference experiment.py:49-72)

    ``mesh``: an optional ('data', 'model') jax.sharding.Mesh
    (parallel.mesh.make_mesh). When given, the whole training run is
    mesh-parallel: params FC-head tensor-parallel over 'model', every
    epoch's batch axis sharded over 'data' (grads/batch-stats psum'd by
    XLA on ICI) — both the device-resident epoch scan and the chunked
    beyond-HBM path. The reference trains strictly single-device
    (experiment.py:75-112, core_functionality.py:139-165)."""
    set_seed(parameters['SEED'])
    print(f'Running Experiment: {exp_name}', flush=True)
    check_parameters(parameters, get_default_parameters())
    if save_results:
        dirs, run_label = create_logging_dirs(exp_name)
        RUN_DIR, MODELS_DIR, METRICS_DIR = dirs
        write_parameters(f'{RUN_DIR}/params.json', parameters)
        print('\tSaving: ', run_label)
    else:
        RUN_DIR, MODELS_DIR, METRICS_DIR = None, None, None
        print('\tRun is not saved!')
    print(params2text(parameters), flush=True)

    train_data, test_data = engine.setup_data(parameters)
    state = engine.setup_model(parameters)
    if mesh is not None:
        from ..parallel.mesh import distribute_state
        state = distribute_state(state, mesh)
    optimize(parameters, train_data, test_data, state, save_results,
             MODELS_DIR, METRICS_DIR, RUN_DIR)
    return state


def optimize(parameters, train_data, test_data, state, save_results,
             MODELS_DIR, METRICS_DIR, RUN_DIR):
    """Epoch loop (reference experiment.py:75-112)."""
    print_log = []
    tstart = None
    for epoch in range(parameters['EPOCHS']):
        last_epoch_dt = round(time.time() - tstart) if tstart else ''
        tstart = time.time()
        print(f'\n\n\nEpoch {epoch}/{parameters["EPOCHS"]}, last epoch took: '
              f'{last_epoch_dt}s\n{config.SPACER}', flush=True)
        epoch_train_info = engine.one_epoch(train_data, state, parameters,
                                            epoch, train=True)
        epoch_test_info = engine.one_epoch(test_data, state, parameters,
                                           epoch, train=False)

        epoch_info = pd.concat([epoch_train_info, epoch_test_info],
                               axis=1).T
        epoch_info.index = pd.MultiIndex.from_tuples(epoch_info.index)
        epoch_info = epoch_info.droplevel(0).T
        epoch_info.columns = pd.MultiIndex.from_product(
            [[epoch], ['train', 'test']])
        summary = epoch_info[(epoch, 'train')].get('total_summed_loss')
        print(config.SPACER, f'\n epoch {epoch}: train loss '
              f'{summary:.3f}' if summary is not None else '')

        if save_results:
            save_epoch_results(epoch_info.T, epoch, parameters, train_data,
                               test_data, state, MODELS_DIR, METRICS_DIR,
                               RUN_DIR)


def save_epoch_results(epoch_info, epoch, parameters, train_data, test_data,
                       state, MODELS_DIR, METRICS_DIR, RUN_DIR):
    """(reference experiment.py:114-142; metrics additionally exported as
    CSV for tool-friendly observability)"""
    epoch_info.to_pickle(f'{METRICS_DIR}/E{epoch:0>4}.pkl')
    epoch_info.to_csv(f'{METRICS_DIR}/E{epoch:0>4}.csv')

    # persist this epoch's augmentation draws — with the seeded RNG these
    # make any epoch's exact input reconstructible
    import json
    with open(f'{METRICS_DIR}/transform_draws.jsonl', 'a') as f:
        f.write(json.dumps({
            'epoch': epoch,
            'train': getattr(train_data, 'last_transform_configs', None),
            'test': getattr(test_data, 'last_transform_configs', None),
        }) + '\n')

    if epoch == 0 and parameters['PLOT_PREPROC']:
        os.makedirs(f'{RUN_DIR}/preproc_data/', exist_ok=True)
        save_preproc_metrics(f'{RUN_DIR}/preproc_data/', train_data,
                             test_data)

    if epoch in parameters['MODEL_CHECKPOINTS']:
        save_checkpoint(state, filename=f'{MODELS_DIR}/E{epoch:0>4}')
        epoch_dir = f'{METRICS_DIR}/{epoch:0>4}_results/'
        os.makedirs(epoch_dir, exist_ok=True)
        from ..viz.video import draw_all
        # no identities at this point — render confident detections unless
        # the kwargs say otherwise
        video_kwargs = dict(parameters['PERF_LOG_VIDEO_KWARGS'])
        video_kwargs.setdefault('which_dets', 'confident')
        for data in (train_data, test_data):
            ax_dets = AxonDetections((state.model, state.variables), data,
                                     parameters, epoch_dir)
            ax_dets.detect_dataset()
            try:
                draw_all(ax_dets,
                         description=f'Notes: {parameters["NOTES"]}',
                         **video_kwargs)
            except Exception as e:      # rendering must not kill training
                print(f'(video render skipped: {e})')


def optimize_MCF_params(exp_name, run, epoch='latest', MCF_param_vals={}):
    """(reference experiment.py:144-156)"""
    EXP_DIR = f'{config.OUTPUT_DIR}/runs/{exp_name}/'
    RUN_DIR = get_run_dir(EXP_DIR, run)
    params = load_parameters(exp_name, run)
    params = to_device_specifc_params(params, get_default_parameters(),
                                      from_cache=config.OUTPUT_DIR)
    params['LOAD_MODEL'] = [exp_name, run, epoch]

    _, test_data = engine.setup_data(params)
    state = engine.setup_model(params)

    ax_dets = AxonDetections((state.model, state.variables), test_data,
                             params, f'{RUN_DIR}/axon_dets')
    ax_dets.detect_dataset('from')
    ax_dets.assign_ids('from', 'from')
    return ax_dets.search_MCF_params(**MCF_param_vals)
