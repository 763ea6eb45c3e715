"""Experiment driver entry point.

Counterpart of the reference's ``experiment/experiment.py`` __main__ block
(experiment.py:158-237): pick an experiment name, adjust default params,
run training; afterwards evaluate runs / tune MCF hyperparameters.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from axtrack_tpu import config
from axtrack_tpu.config import OUTPUT_DIR, DEPLOYED_MODEL_DIR
from axtrack_tpu.params import (get_default_parameters, load_parameters,
                                compare_parameters, update_MCF_params)
from axtrack_tpu.train.experiment import run_experiment, optimize_MCF_params
from axtrack_tpu.utils import clean_rundirs
from axtrack_tpu.utils.epochs import prepend_prev_run
from axtrack_tpu.evaluation import (evaluate_preprocssing, evaluate_training,
                                    evaluate_precision_recall, evaluate_model,
                                    evaulate_ID_assignment)

if __name__ == '__main__':
    """Set the experiment name (matched with a directory)."""
    exp_name = 'v1Model_tpu_exp1'

    """Tidy up old runs (uncomment as needed)."""
    # clean_rundirs(exp_name, delete_runs_min_epochs=10)

    """Adjust the defaults for this run."""
    parameters = get_default_parameters()
    parameters['NOTES'] = 'tpu-native retraining run'
    parameters['FROM_CACHE'] = None
    parameters['CACHE'] = None
    # parameters['LOAD_MODEL'] = DEPLOYED_MODEL_DIR
    # parameters['PERF_LOG_VIDEO_KWARGS'] = {'animated': True,
    #                                        't_y_x_slice': [(0, 50), None, None]}
    # full-dataset splits (reference config.py:19-23):
    # parameters['TRAIN_TIMEPOINTS'] = config.WHOLE_DATASET_TRAIN_FRAMES
    # parameters['TEST_TIMEPOINTS'] = config.WHOLE_DATASET_TEST_FRAMES

    """Run the experiment (model optimization)."""
    run_experiment(exp_name, parameters, save_results=True)

    """=================== WHEN ALL EPOCHS DONE ======================="""
    """Glue two runs together / compare parameters:"""
    # prepend_prev_run(exp_name, 'run00', 'run01')
    # print(compare_parameters(load_parameters(exp_name, 'run00'),
    #                          load_parameters(exp_name, 'run01')))

    """Evaluate a run:"""
    # evaluate_preprocssing(exp_name, 'run00', show=False)
    # evaluate_training([[exp_name, 'run00']], show=False, recreate=True)
    # evaluate_precision_recall([[exp_name, 'run00', 100]], show=False)
    # evaluate_model(exp_name, 'run00', 'latest', which_data='test',
    #                which_dets='IDed', show=False, animated=True)

    """MCF hyperparameter search + writeback:"""
    # optimize_MCF_params(exp_name, 'run00', 'latest', MCF_param_vals={
    #     'edge_cost_thr_values': [.1, .3, .4, .6, .7, .8, 1, 2],
    #     'entry_exit_cost_values': [1, 1.1, 1.7, 2, 2.3, 3],
    #     'miss_rate_values': [0.9, 0.6],
    #     'vis_sim_weight_values': [0, 0.1, .4],
    #     'conf_capping_method_values': ['ceil', 'scale_to_max']})
    # update_MCF_params(exp_name, 'run00', 'latest')
    # evaulate_ID_assignment(exp_name, 'run00', 'latest', show=False)
