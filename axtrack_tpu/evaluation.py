"""Experiment evaluation drivers.

Counterpart of reference axtrack/exp_evaluation.py:33-142: inspect a
finished run's preprocessing, training curves, precision/recall, model
inference quality, and ID-assignment hyperparameter search results.
"""
import os

import pandas as pd

from .config import OUTPUT_DIR
from .params import (get_default_parameters, to_device_specifc_params,
                     compare_parameters, load_parameters, params2text)
from .train import engine
from .utils import set_seed, turn_tex, save_preproc_metrics
from .utils.rundirs import get_run_dir
from .utils.epochs import get_all_epoch_data
from .viz.plots import (plot_preprocessed_input_data, plot_training_process,
                        plot_prc_rcl, plot_IDassignment_performance)
from .viz.video import draw_all
from .detections import AxonDetections


def setup_evaluation(exp_name, run, print_params=True):
    """(reference exp_evaluation.py:33-41)"""
    EXP_DIR = f'{OUTPUT_DIR}/runs/{exp_name}/'
    RUN_DIR = get_run_dir(EXP_DIR, run)
    parameters = load_parameters(exp_name, run)
    turn_tex('on')
    if print_params:
        print(params2text(parameters))
    set_seed(parameters['SEED'])
    return RUN_DIR, parameters


def evaluate_preprocssing(exp_name, run, show=True):
    """(reference exp_evaluation.py:43-61; name typo kept for parity)"""
    RUN_DIR, params = setup_evaluation(exp_name, run)
    PREPROC_DATA_DIR = f'{RUN_DIR}/preproc_data/'
    preproc_files = [f for f in os.listdir(PREPROC_DATA_DIR)
                     if f.endswith('_preproc_data.csv')] \
        if os.path.isdir(PREPROC_DATA_DIR) else []
    if not preproc_files:
        train_data, test_data = engine.setup_data(params)
        os.makedirs(PREPROC_DATA_DIR, exist_ok=True)
        save_preproc_metrics(PREPROC_DATA_DIR, train_data, test_data)
        preproc_files = [f for f in os.listdir(PREPROC_DATA_DIR)
                         if f.endswith('_preproc_data.csv')]
    data = pd.read_csv(os.path.join(PREPROC_DATA_DIR, preproc_files[0]),
                       header=[0, 1, 2], index_col=0)
    print('Evaluating preprocessing steps...', end='')
    plot_preprocessed_input_data(data, 'train', params['NOTES'],
                                 dest_dir=RUN_DIR, show=show)
    print('Done.')


def evaluate_training(exp_run_ids, recreate=False, use_prepend_ifavail=True,
                      show=True):
    """(reference exp_evaluation.py:63-83)"""
    training = {}
    dest_dir, base_params = None, None
    for i, (exp_name, run) in enumerate(exp_run_ids):
        RUN_DIR, params = setup_evaluation(
            exp_name, run, print_params=len(exp_run_ids) == 1)
        lbl = f"{run} - {params['NOTES']}"
        if i == 0:
            dest_dir = RUN_DIR
            base_params = params
        else:
            print(compare_parameters(base_params, params))
        training[lbl], _ = get_all_epoch_data(exp_name, run, recreate,
                                              use_prepend_ifavail)
    print(f'Evaluating training of {lbl}...', end='')
    plot_training_process(training, dest_dir=dest_dir, show=show)
    print('Done. ')


def evaluate_precision_recall(exp_run_epoch_ids, show=True, avg_over_t=30,
                              recreate=False, use_prepend_ifavail=True):
    """(reference exp_evaluation.py:85-106)"""
    metrics = {}
    dest_dir, base_params = None, None
    for i, (exp_name, run, epoch) in enumerate(exp_run_epoch_ids):
        RUN_DIR, params = setup_evaluation(exp_name, run, print_params=False)
        lbl = f"{run} E{epoch:0>3} - {params['NOTES']}"
        if i == 0:
            base_params = params
            dest_dir = RUN_DIR
        else:
            print(compare_parameters(base_params, params))
        _, dat = get_all_epoch_data(exp_name, run, recreate,
                                    use_prepend_ifavail)
        window = dat.loc[epoch - avg_over_t // 2:
                         epoch + avg_over_t // 2 + 1].dropna(how='all')
        metrics[lbl] = window.mean()
    print(f'Evaluating precision/recall of {lbl}...', end='')
    plot_prc_rcl(metrics, dest_dir=dest_dir, show=show)
    print('Done.')


def evaluate_model(exp_name, run, epoch='latest', which_data='test',
                   which_dets='confident', show=True, cache_detections='to',
                   astar_paths_cache='to', assigedIDs_cache='to', **kwargs):
    """Re-run inference from a checkpoint + render
    (reference exp_evaluation.py:108-130)."""
    print('\nEvaluating model...', end='')
    RUN_DIR, params = setup_evaluation(exp_name, run)
    params = to_device_specifc_params(params, get_default_parameters(),
                                      from_cache=OUTPUT_DIR)
    params['LOAD_MODEL'] = [exp_name, run, epoch]
    train_data, test_data = engine.setup_data(params)
    data = test_data if which_data == 'test' else train_data
    state = engine.setup_model(params)

    dest_dir = f'{RUN_DIR}/axon_dets'
    axon_detections = AxonDetections((state.model, state.variables), data,
                                     params, dest_dir)
    axon_detections.detect_dataset(cache=cache_detections)
    if which_dets == 'IDed':
        axon_detections.assign_ids(astar_paths_cache, assigedIDs_cache)

    description = f'{exp_name}, {run}, Epoch:{epoch}, ' \
                  f'Notes: {params["NOTES"]}'
    draw_all(axon_detections, which_dets=which_dets, show=show,
             description=description, **kwargs)
    return axon_detections


def evaulate_ID_assignment(exp_name, run, epoch='latest', show=True,
                           **kwargs):
    """(reference exp_evaluation.py:132-142; name typo kept for parity)"""
    RUN_DIR, params = setup_evaluation(exp_name, run)
    results_fname = f'{RUN_DIR}/axon_dets/MCF_params_results.csv'
    if not os.path.exists(results_fname):
        raise FileNotFoundError(
            'Run optimize_MCF_params() first to evaluate MCF parameters!')
    results = pd.read_csv(results_fname, index_col=0)
    plot_IDassignment_performance(results, dest_dir=f'{RUN_DIR}/axon_dets/',
                                  show=show, **kwargs)
