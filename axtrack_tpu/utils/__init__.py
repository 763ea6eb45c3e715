"""Infra utilities (counterpart of reference axtrack/utils.py).

Run dirs live in .rundirs, stage caching in .caching, checkpointing in
axtrack_tpu.train.checkpoint, the A* oracle in axtrack_tpu.native.
"""
import pickle

import numpy as np

from .rundirs import create_logging_dirs, get_run_dir, clean_rundirs  # noqa: F401
from .caching import StageCache  # noqa: F401

_GLOBAL_SEED = [42]


def set_seed(seed):
    """Seed numpy's global RNG and record the seed for JAX PRNG-key derivation
    (reference utils.py:73-76 seeds torch+numpy; JAX is functional, so
    components derive keys via ``new_key()``)."""
    np.random.seed(seed)
    _GLOBAL_SEED[0] = int(seed)


def global_seed():
    return _GLOBAL_SEED[0]


def new_key(*fold_data):
    """Derive a fresh jax PRNG key from the global seed, folded with ints."""
    import jax
    key = jax.random.PRNGKey(_GLOBAL_SEED[0])
    for d in fold_data:
        key = jax.random.fold_in(key, int(d))
    return key


def turn_tex(on_off):
    """Toggle TeX rendering in matplotlib (reference utils.py:320-325).
    Only enabled when a latex binary exists; silently a no-op otherwise."""
    import shutil as _shutil
    import matplotlib.pyplot as plt
    if on_off == 'on' and _shutil.which('latex'):
        plt.rc('text', usetex=True)
        plt.rc('text.latex', preamble=r'\usepackage{amsmath} \usepackage{upgreek}'
                                      r' \usepackage{underscore}')
    elif on_off == 'off':
        plt.rc('text', usetex=False)


def get_data_standardization_scaler(fname):
    """Load a standardization scaler tuple ('zscore', (var, mean)).
    Supports the reference's pickle format (utils.py:346-349) and json."""
    if fname.endswith('.json'):
        import json
        with open(fname) as f:
            kind, scalers = json.load(f)
        return (kind, tuple(scalers) if scalers is not None else None)
    with open(fname, 'rb') as file:
        return pickle.load(file)


def save_preproc_metrics(dest_dir, dataset1, dataset2=None):
    """Sample 1e6 pixels after each preprocessing step to CSV for
    distribution-shift checking (reference utils.py:90-110)."""
    import pandas as pd
    samples = []
    rng = np.random.default_rng()
    smple_indices = rng.choice(dataset1.plot_data['Original'][0].size, int(1e6))

    datasets = [dataset1] + ([dataset2] if dataset2 is not None else [])
    for ds in datasets:
        for which_step, arr in ds.plot_data.items():
            t0_sample = np.asarray(arr[0]).flatten()[smple_indices]
            tn1_sample = np.asarray(arr[1]).flatten()[smple_indices]
            samples.append(pd.Series(t0_sample, name=(ds.name, which_step, 't_0')))
            samples.append(pd.Series(tn1_sample, name=(ds.name, which_step, 't_-1')))

    fname = f'{dest_dir}/{dataset1.name}_preproc_data.csv'
    pd.concat(samples, axis=1).to_csv(fname)
    return fname
