"""Parameter system.

TPU-native counterpart of the reference's ``axtrack/exp_parameters.py``
(/root/reference/axtrack/exp_parameters.py:12-214). The reference keeps a flat
54-key OrderedDict; we keep the exact key set and dict surface (``P['SY']``)
for API parity, but persist as JSON + txt instead of pickle, and express the
activation spec framework-neutrally (('leaky_relu', 0.1) instead of an
``nn.LeakyReLU`` instance — reference exp_parameters.py:63).
"""
import os
import json
from collections import OrderedDict

from .config import (TRAINING_DATA_DIR, OUTPUT_DIR, DEFAULT_DEVICE,
                     DEFAULT_NUM_WORKERS, SPACER)


def get_default_parameters():
    """Default parameter dict; key set mirrors reference exp_parameters.py:12-103
    (ground truth: deployed_model/params.txt:1-54)."""
    # DATA
    TIMELAPSE_FILE = os.path.join(TRAINING_DATA_DIR, 'training_timelapse.tif')
    LABELS_FILE = os.path.join(TRAINING_DATA_DIR, 'axon_anchor_labels.csv')
    MASK_FILE = os.path.join(TRAINING_DATA_DIR, 'training_mask.npy')
    TRAIN_TIMEPOINTS = list(range(4, 33))
    TEST_TIMEPOINTS = list(range(2, 4)) + list(range(33, 35))

    LOG_CORRECT = True
    PLOT_PREPROC = True
    STANDARDIZE = ('zscore', None)

    STANDARDIZE_FRAMEWISE = False
    TEMPORAL_CONTEXT = 2
    USE_MOTION_DATA = 'exclude'   # {'exclude', 'include', 'only'}
    USE_SPARSE = False
    USE_TRANSFORMS = ['vflip', 'hflip', 'rot', 'translateY', 'translateX']
    CLIP_LOWERLIM = 55 / 2**16
    OFFSET = None
    PAD = [0, 300, 0, 300]
    CACHE = None
    FROM_CACHE = OUTPUT_DIR
    SHUFFLE = True
    DROP_LAST = False

    # MODEL — conv spec rows: (kernelsize, out_channels, stride, groups); 'M'
    # is 2x2 maxpool (reference exp_parameters.py:38-57).
    ARCHITECTURE = [
        [(3, 20, 2, 1),
         (3, 40, 2, 1),
         (3, 80, 1, 1),
         'M',
         (3, 80, 1, 1),
         (3, 80, 1, 1),
         'M',
         (3, 80, 1, 1),
         (3, 80, 1, 1),
         'M',
         (3, 160, 1, 1),
         ],
        [('FC', 1024),
         ('activation', 'sigmoid'),
         ('FC', 1024),
         ('activation', 'sigmoid'),
         ]
    ]

    IMG_DIM = (2920, 6364)
    SY, SX = 12, 12
    TILESIZE = 512
    ACTIVATION_FUNCTION = ('leaky_relu', 0.1)

    # ID stuff
    NON_MAX_SUPRESSION_DIST = 23

    WEIGHT_DECAY = 5e-4
    BATCH_SIZE = 32
    EPOCHS = 1501
    LOAD_MODEL = None   # [ExpName, run, epoch|'latest'] or a directory
    BBOX_THRESHOLD = .7
    LR = 5e-4
    LR_DECAYRATE = 15

    # LOSS
    L_OBJECT = 49.5
    L_NOBJECT = 1
    L_COORD_ANCHOR = 49.5

    # min cost flow (id association) — reference exp_parameters.py:83-91
    MCF_EDGE_COST_THR = 0.7
    MCF_ENTRY_EXIT_COST = 2
    MCF_MISS_RATE = 0.6
    MCF_MAX_NUM_MISSES = 1
    MCF_MIN_FLOW = 5
    MCF_MAX_FLOW = 450
    MCF_MAX_CONF_COST = 4.6
    MCF_VIS_SIM_WEIGHT = 0
    MCF_CONF_CAPPING_METHOD = 'scale_to_max'

    # RUN SETTINGS
    SEED = 42
    DEVICE = DEFAULT_DEVICE
    NUM_WORKERS = DEFAULT_NUM_WORKERS
    PIN_MEMORY = True
    NOTES = 'no notes - shame on you!'
    MODEL_CHECKPOINTS = (1, 250, 750, 1000, 1500)
    PERF_LOG_VIDEO_KWARGS = {}

    param_dict = OrderedDict({key: val for key, val in locals().items()})
    return param_dict


def architecture_to_text(arch):
    text = ''
    empty = ''
    for i, arch_group in enumerate(arch):
        if i == 1:
            text += f'{empty:28}== FullyConnected Head ==\n'
        for j, layer in enumerate(arch_group):
            if i == j == 0:
                text += f'{empty:8} {layer}\n'
            text += f'{empty:28} {layer}\n'
    return text


def _to_jsonable(val):
    if isinstance(val, range):
        return {'__range__': [val.start, val.stop, val.step]}
    if isinstance(val, tuple):
        return {'__tuple__': [_to_jsonable(v) for v in val]}
    if isinstance(val, list):
        return [_to_jsonable(v) for v in val]
    if isinstance(val, dict):
        return {k: _to_jsonable(v) for k, v in val.items()}
    return val


def _from_jsonable(val):
    if isinstance(val, dict):
        if '__range__' in val:
            return range(*val['__range__'])
        if '__tuple__' in val:
            return tuple(_from_jsonable(v) for v in val['__tuple__'])
        return {k: _from_jsonable(v) for k, v in val.items()}
    if isinstance(val, list):
        return [_from_jsonable(v) for v in val]
    return val


def write_parameters(file, params):
    """Persist params as .json + human-readable .txt (reference wrote pickle
    + txt, exp_parameters.py:105-108). ``file`` may end in .json or .pkl —
    the latter is rewritten to .json for safety."""
    base = file.rsplit('.', 1)[0]
    with open(base + '.txt', 'w') as txt_file:
        txt_file.writelines([f'{key:20} {val}\n' for key, val in params.items()])
    with open(base + '.json', 'w') as f:
        json.dump(_to_jsonable(dict(params)), f, indent=1)


def load_parameters(exp_name, run, from_directory=None):
    """Load params from a run dir or explicit directory
    (reference exp_parameters.py:110-117)."""
    from .utils.rundirs import get_run_dir
    if exp_name is not None and run is not None:
        exp_dir = f'{OUTPUT_DIR}/runs/{exp_name}/'
        run_dir = get_run_dir(exp_dir, run)
        file = f'{run_dir}/params.json'
    elif from_directory:
        file = f'{from_directory}/params.json'
    else:
        raise ValueError('pass exp_name+run or from_directory')
    with open(file) as f:
        loaded = _from_jsonable(json.load(f))
    params = get_default_parameters()
    params.update(loaded)
    return params


def get_notes(exp_name, run):
    return load_parameters(exp_name, run)['NOTES']


def params2text(params):
    """Human-readable dump (reference exp_parameters.py:122-143)."""
    text = SPACER + '\n'
    for key, val in params.items():
        if key == 'TIMELAPSE_FILE':
            text += '\n\t>> data parameters <<\n'
        elif key == 'ARCHITECTURE':
            text += '\n\t>> model & training <<\n'
            text += f'\t\t{key}'
            text += architecture_to_text(val)
            continue
        elif key == 'L_OBJECT':
            text += '\n\t>> loss <<\n'
        elif key == 'SEED':
            text += '\n\t>> run settings <<\n'
        if key.endswith('TIMEPOINTS') and hasattr(val, '__len__') and len(val) > 30:
            n = len(val)
            val = list(val)
            val = f'{val[:5]} ... {val[n//2:n//2+5]} ... {val[-5:]} (n={n})'
        text += f'\t\t{key:20} {val}\n'
    text += SPACER + '\n'
    return text


def check_parameters(passed_params, default_params):
    """Reject unknown keys (reference exp_parameters.py:145-149). Raises
    instead of the reference's exit(1)."""
    inval_keys = [key for key in passed_params if key not in default_params]
    if inval_keys:
        raise ValueError(f'Invalid parameters passed: {inval_keys}')


def to_device_specifc_params(model_parameters, local_default_params,
                             from_cache=None, cache=None, fill_missing_keys=True):
    """Swap machine-specific keys for local ones (reference
    exp_parameters.py:151-162). Name kept (typo included) for API parity."""
    to_update = ('TIMELAPSE_FILE', 'LABELS_FILE', 'MASK_FILE', 'DEVICE')
    for key in to_update:
        model_parameters[key] = local_default_params[key]
    if from_cache is not None:
        model_parameters['FROM_CACHE'] = from_cache
    if cache is not None:
        model_parameters['CACHE'] = cache
    if fill_missing_keys:
        for key, val in local_default_params.items():
            if key not in model_parameters:
                model_parameters[key] = val
    return model_parameters


def compare_parameters(param1, param2):
    """Param diff tool (reference exp_parameters.py:164-195)."""
    text = ''
    param1_only = [key for key in param1 if key not in param2]
    param2_only = [key for key in param2 if key not in param1]

    for name, only in (('P1', param1_only), ('P2', param2_only)):
        text += '\n' + SPACER
        text += f'\nParameters only in {name}:\n'
        src = param1 if name == 'P1' else param2
        if only:
            text += '\n'.join([f'\t{key}: {src[key]}' for key in only])
            text += '\n' + SPACER + '\n'

    text += '\n' + SPACER
    text += '\nParameters that differ:\n'
    for key in param1.keys():
        if key in param1_only or key not in param2:
            continue
        if param1[key] != param2[key]:
            text += f'\n{key}:'
            if key == 'ARCHITECTURE':
                text += f'\n\t\t\t\tP1: {architecture_to_text(param1[key])}:'
                text += f'\n\t\t\t\tP2: {architecture_to_text(param2[key])}:'
            else:
                text += f'\n\tP1: {param1[key]}:'
                text += f'\n\tP2: {param2[key]}:'
    text += '\n' + SPACER + '\n'
    return text


def update_MCF_params(exp_name, run, epoch='latest'):
    """Write the best grid-searched MCF params back into the run's params
    (reference exp_parameters.py:197-215)."""
    import pandas as pd
    from .utils.rundirs import get_run_dir
    exp_dir = f'{OUTPUT_DIR}/runs/{exp_name}/'
    run_dir = get_run_dir(exp_dir, run)
    parameters = load_parameters(exp_name, run)

    results_fname = f'{run_dir}/axon_dets/MCF_params_results.csv'
    if not os.path.exists(results_fname):
        raise FileNotFoundError(
            'Run optimize_MCF_params() first to evaluate MCF parameters!')

    results = pd.read_csv(results_fname, index_col=0)
    params = results.sort_values(['idf1', 'mota'], ascending=False).iloc[0, :5]
    new_MCF_params = dict(zip(['MCF_' + o.upper() for o in params.index],
                              params.values))
    print('Updating min cost flow parameters to: ', new_MCF_params)
    parameters.update(new_MCF_params)
    print(params2text(parameters))
    write_parameters(f'{run_dir}/params.json', parameters)
