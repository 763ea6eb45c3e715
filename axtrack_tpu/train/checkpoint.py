"""Checkpointing with orbax.

Counterpart of reference utils.py:258-288 (torch .pth state dicts). Saves
model params + BatchNorm stats + optimizer state + epoch into an orbax
checkpoint directory per epoch (E%04d), and restores either from an explicit
directory (deployment bundles) or a [exp_name, run, epoch|'latest'] triple.
"""
import glob
import os

import jax
import numpy as np
import orbax.checkpoint as ocp

from ..config import OUTPUT_DIR


def _to_numpy_tree(tree):
    return jax.tree.map(np.asarray, tree)


def save_checkpoint(state, filename, include_opt=True):
    """Save model+optimizer+epoch (reference utils.py:258-263). ``filename``
    becomes a checkpoint directory.

    include_opt=False drops the optimizer state (2x the param bytes under
    adam) — used for deployment bundles, which are inference-only and
    committed to the repo."""
    print('=> Saving model checkpoint')
    path = os.path.abspath(filename)
    ckpt = {'params': _to_numpy_tree(state.params),
            'batch_stats': _to_numpy_tree(state.batch_stats),
            'epoch': state.epoch}
    if include_opt:
        ckpt['opt_state'] = _to_numpy_tree(state.opt_state)
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, ckpt, force=True)


def _restore(path, state):
    with ocp.PyTreeCheckpointer() as ckptr:
        template = {'params': _to_numpy_tree(state.params),
                    'batch_stats': _to_numpy_tree(state.batch_stats),
                    'opt_state': _to_numpy_tree(state.opt_state),
                    'epoch': 0}
        try:
            ckpt = ckptr.restore(path, item=template)
        except Exception:
            # template mismatch (e.g. an opt-state-free deployment bundle,
            # include_opt=False) or older-orbax item signature: restore the
            # tree as saved
            ckpt = ckptr.restore(path)
    state.params = jax.tree.map(jax.numpy.asarray, ckpt['params'])
    state.batch_stats = jax.tree.map(jax.numpy.asarray, ckpt['batch_stats'])
    if ckpt.get('opt_state') is not None:
        # restored leaves land in the same treedef as the template
        state.opt_state = jax.tree.unflatten(
            jax.tree.structure(state.opt_state),
            jax.tree.leaves(ckpt['opt_state']))
    state.epoch = int(ckpt.get('epoch', 0))


def load_checkpoint(load_model, state, device=None):
    """Restore a checkpoint (reference utils.py:265-288).

    load_model: a directory containing checkpoint dirs (deployment bundle;
    first E*/ alphabetically, matching the reference's sorted-glob-first) or
    [exp_name, run, epoch|'latest'].
    """
    print('=> Loading model checkpoint...', end='')
    print(load_model)
    if isinstance(load_model, str):
        if load_model.endswith(('.pth', '.pt')):
            # a reference torch checkpoint: convert in place
            # (models/torch_convert.py; reference utils.py:265-288 loads
            # these with torch.load)
            from ..models.torch_convert import load_torch_checkpoint
            variables = load_torch_checkpoint(load_model, state.P)
            state.params = jax.tree.map(jax.numpy.asarray,
                                        variables['params'])
            state.batch_stats = jax.tree.map(jax.numpy.asarray,
                                             variables['batch_stats'])
            print(f' - {load_model} (torch->flax) - Done.\n', flush=True)
            return
        cands = sorted(glob.glob(f'{load_model}/E*'))
        cands = [c for c in cands if os.path.isdir(c)]
        if not cands:
            pth = sorted(glob.glob(f'{load_model}/E*.pth'))
            if pth:
                return load_checkpoint(pth[0], state, device)
            raise FileNotFoundError(f'no checkpoint dirs in {load_model}')
        file = cands[0]
    else:
        exp_dir = f'{OUTPUT_DIR}/runs/{load_model[0]}/'
        run_dir = [rd for rd in os.listdir(exp_dir) if load_model[1] in rd][0]
        if load_model[2] == 'latest':
            file = sorted(glob.glob(f'{exp_dir}/{run_dir}/models/E*'))[-1]
        else:
            file = f'{exp_dir}/{run_dir}/models/E{load_model[2]:0>4}'
    _restore(os.path.abspath(file), state)
    print(f' - {file} - Done.\n', flush=True)
