"""Public inference API.

TPU-native rebuild of reference axtrack/interface.py:19-320. The three-step
surface is preserved verbatim (README.md:30-46):

    parameters, model, stnd_scaler = setup_inference(dest_dir)
    timelapse = prepare_input_data(imseq_fname, parameters, dest_dir, ...)
    axon_dets = inference(timelapse, model, dest_dir, parameters, ...)
    axon_dets.IDed_dets_all
    visualize_inference(axon_dets, ...)

``model`` is a (flax module, variables) pair instead of a torch Module; it
is passed straight back into inference() so user code is unchanged.

The deployed bundle directory (config.DEPLOYED_MODEL_DIR) holds params.json,
train_stnd_scaler.pkl and an orbax checkpoint dir E%04d — create one from a
training run with deploy_run(), or a synthetic-data bundle with
scripts/make_deployed_model.py.
"""
import os

import pandas as pd

from .config import DEPLOYED_MODEL_DIR, DEFAULT_DEVICE, DEFAULT_NUM_WORKERS
from .params import load_parameters, params2text
from .train import engine
from .data.timelapse import Timelapse
from .detections import AxonDetections
from .utils import (turn_tex, set_seed, get_data_standardization_scaler,
                    save_preproc_metrics)


def _get_params(num_workers=None, device=None, deployed_dir=None):
    parameters = load_parameters(
        exp_name=None, run=None,
        from_directory=deployed_dir or DEPLOYED_MODEL_DIR)
    if num_workers:
        parameters['NUM_WORKERS'] = num_workers
    if device:
        parameters['DEVICE'] = device
    return parameters


def _get_model(parameters, print_params=False, deployed_dir=None,
               precision='f32'):
    parameters['LOAD_MODEL'] = deployed_dir or DEPLOYED_MODEL_DIR
    state = engine.setup_model(parameters)
    module = state.model
    if precision != 'f32':
        # inference-only compute-dtype override: the checkpointed weights
        # stay f32 (flax casts per-op), so this changes arithmetic only.
        # 'mixed' = bf16 convs (~97% of FLOPs) + f32 FC head — measured
        # 0.0% detection mismatch after 1px tolerance on the deployed
        # bundle (scripts/check_bf16_parity.py) at ~2.5x detect speed on
        # TPU; 'bf16' runs the whole net in bf16 (same 1px-parity, lower
        # exact-pixel agreement).
        import jax.numpy as jnp
        from .models.yolo import build_model
        if precision not in ('mixed', 'bf16'):
            raise ValueError(f"precision must be 'f32', 'mixed' or 'bf16', "
                             f"got {precision!r}")
        module = build_model(
            parameters, dtype=jnp.bfloat16,
            fc_dtype=jnp.float32 if precision == 'mixed' else None)
    if print_params:
        print(params2text(parameters))
    return (module, state.variables)


def _get_train_data(parameters):
    """(reference interface.py:35-36 — which referenced setup_data without
    importing it; fixed here)"""
    return engine.setup_data(parameters, skip_test=True)[0]


def setup_inference(dest_dir, print_params=False,
                    num_workers=DEFAULT_NUM_WORKERS, device=DEFAULT_DEVICE,
                    deployed_dir=None, precision='f32'):
    """Setup model and parameters for detecting axons
    (reference interface.py:38-77).

    Returns (parameters, model, stnd_scaler) where model is a
    (flax module, variables) pair and stnd_scaler e.g.
    ('zscore', (0.0151, 0.0094)).

    ``precision``: 'f32' (reference numerics), 'mixed' (bf16 conv stack +
    f32 FC head — ~2.5x faster detection on TPU, measured 0.0% detection
    mismatch after 1px tolerance vs f32 on the deployed bundle), or
    'bf16' (whole net).
    """
    deployed_dir = deployed_dir or DEPLOYED_MODEL_DIR
    parameters = _get_params(num_workers, device, deployed_dir)
    set_seed(parameters['SEED'])
    turn_tex('on')
    model = _get_model(parameters, print_params, deployed_dir, precision)
    scaler_fname = f'{deployed_dir}/train_stnd_scaler.pkl'
    stnd_scaler = get_data_standardization_scaler(scaler_fname)
    os.makedirs(dest_dir, exist_ok=True)
    return parameters, model, stnd_scaler


def prepare_input_data(imseq_fname, parameters, dest_dir, inference_data_dir,
                       stnd_scaler, mask_fname=None, use_cached_datasets='to',
                       check_preproc=False, input_metadata={}):
    """Generate the Timelapse input object (reference interface.py:79-168)."""
    pad = input_metadata.get('pad')
    if pad:
        pad = [pad] * 4
    timelapse = Timelapse(
        imseq_path=f'{inference_data_dir}/{imseq_fname}',
        mask_path=(f'{inference_data_dir}/{mask_fname}'
                   if mask_fname else None),
        labels_csv=None,
        timepoints=None,
        pad=pad,
        use_transforms=[],
        cache=dest_dir if use_cached_datasets == 'to' else None,
        from_cache=dest_dir if use_cached_datasets == 'from' else None,
        name=input_metadata.get('name'),
        dt=input_metadata.get('dt_min', input_metadata.get('dt')),
        pixelsize=input_metadata.get('pixelsize'),
        incubation_time=input_metadata.get('incubation_time_min',
                                           input_metadata.get(
                                               'incubation_time')),
        seeding_datetime=input_metadata.get('seeding_datetime'),
        notes=input_metadata.get('notes'),
        offset=input_metadata.get('intensity_offset'),
        contrast_llim=input_metadata.get('clip_intensity'),
        log_correct=parameters['LOG_CORRECT'],
        standardize_framewise=parameters['STANDARDIZE_FRAMEWISE'],
        standardize=stnd_scaler,
        use_motion_filtered=parameters['USE_MOTION_DATA'],
        use_sparse=parameters['USE_SPARSE'],
        temporal_context=parameters['TEMPORAL_CONTEXT'],
        plot=parameters['PLOT_PREPROC'],
        tilesize=parameters['TILESIZE'],
        Sy=parameters['SY'],
        Sx=parameters['SX'])

    if check_preproc and not timelapse.plot_data:
        print('(check_preproc requested but PLOT_PREPROC is off in the '
              'deployed params; skipping distribution check)')
        check_preproc = False
    if check_preproc:
        infrc_preproc_fname = save_preproc_metrics(dest_dir, timelapse)
        infrc_prproc = pd.read_csv(infrc_preproc_fname, index_col=0,
                                   header=[0, 1, 2])
        train_preproc_fname = f'{DEPLOYED_MODEL_DIR}/train_preproc_data.csv'
        if os.path.exists(train_preproc_fname):
            from .viz.plots import plot_preprocessed_input_data
            train_preproc = pd.read_csv(train_preproc_fname, index_col=0,
                                        header=[0, 1, 2]).loc[:, ['train']]
            plot_preprocessed_input_data(
                pd.concat([infrc_prproc, train_preproc], axis=1),
                name=timelapse.name, dest_dir=dest_dir, show=False)
        else:
            print('(no train_preproc_data.csv in deployed bundle; '
                  'skipping distribution comparison plot)')
    return timelapse


def inference(timelapse, model, dest_dir, parameters, detections_cache='to',
              astar_paths_cache='to', assigedIDs_cache='to',
              shard_frames=False, mesh=None):
    """Detect growth cones and associate identities
    (reference interface.py:170-215). Final product:
    ``axon_detections.IDed_dets_all``.

    shard_frames=True routes detection + geodesic distances through the
    long-movie sequence-parallel pipeline (parallel/longmovie.py): the
    movie's frame axis is sharded over the mesh 'data' chips with ppermute
    halo exchange for the temporal context — use it when a multi-chip mesh
    is available and the movie is long. Results match the single-chip path
    (equality-tested on an 8-device mesh), and the tri-state stage caches
    (detections_cache / astar_paths_cache / assigedIDs_cache, reference
    interface.py:170-202) read and write the SAME cache files on both
    routes — a movie detected on the mesh can be re-associated single-chip
    from cache and vice versa. ``mesh`` defaults to a data-only mesh over
    all devices.
    """
    dets_dest_dir = f'{dest_dir}/axon_dets'
    axon_detections = AxonDetections(model, timelapse, parameters,
                                     dets_dest_dir)
    if shard_frames:
        axon_detections.detect_and_associate_sharded(
            mesh=mesh, detections_cache=detections_cache,
            astar_paths_cache=astar_paths_cache)
        axon_detections.assign_ids('precomputed', assigedIDs_cache)
    else:
        axon_detections.detect_dataset(cache=detections_cache)
        axon_detections.assign_ids(astar_paths_cache, assigedIDs_cache)
    return axon_detections


def inference_many(timelapses, model, dest_dirs, parameters, depth=None,
                   detections_cache='to', astar_paths_cache='to',
                   assigedIDs_cache='to'):
    """Serve several movies with overlapped device compute (new
    capability — the reference processes one movie at a time).

    A serving deployment keeps movies queued. Because ``detect_dataset``
    chains the association program onto the detection output handles
    (eager association), a movie's chamfer wavefronts keep the chip busy
    while the host fetches, solves the MCF, and assembles identities for
    the PREVIOUS movie — the queueing discipline bench.py's pipelined
    mode measured at 69.5 frames/sec vs 61.7 single-movie, here on the
    public surface. Results are identical to sequential ``inference``
    calls (equality-tested): only the dispatch order differs.

    Args:
      timelapses: list of prepared ``Timelapse`` datasets.
      dest_dirs: one dest dir per movie (or one string used for all, with
        the movie name distinguishing the cache files).
      depth: movies in flight (None = auto from each movie's true device
        residency: chamfer windows ``(T-1)*cap*window^2*4`` bytes PLUS —
        because nothing is fetched until ``depth`` movies are queued —
        the movie's tile stack and device-movie cache on the non-staged
        path, against a ~9 GB budget). Full-size f32 movies allow ~2 in
        flight; movies loaded in STAGED u16 mode (set
        ``AXTRACK_DEVICE_MOVIE_BUDGET`` below ``2*movie_bytes`` before
        constructing the Timelapse) are ~4x lighter and overlap deeper.
      *_cache: tri-state stage caches, as in ``inference``, applied per
        movie.

    Returns the list of ``AxonDetections``, one per movie, in order.
    """
    from collections import deque
    if isinstance(dest_dirs, str):
        dest_dirs = [dest_dirs] * len(timelapses)

    if depth is None:
        per = [1]
        for tl in timelapses:
            window = AxonDetections(model, tl, parameters,
                                    None)._assoc_window()
            eager = (max(tl.sizet - 1, 1)
                     * int(getattr(tl, '_eager_assoc_cap', 64))
                     * window ** 2 * 4)
            # non-staged movies hold the f32 device movie + tile stack
            # until their queued programs complete (release_device_arrays
            # drops the refs, but the buffers live while in flight)
            movie = (tl.X.nbytes if getattr(tl, '_u16_staged', False)
                     else 2 * tl.X.nbytes)
            per.append(eager + movie)
        depth = max(1, min(len(timelapses), int(9e9 // max(per))))

    results = []
    queue = deque()
    for tl, dest in zip(timelapses, dest_dirs):
        ax = AxonDetections(model, tl, parameters, f'{dest}/axon_dets')
        ax.detect_dataset(cache=detections_cache)   # + eager association
        # the movie's tile stack + device-movie cache (~5 GB at
        # reference geometry) are no longer needed — only the eager
        # association buffers are; without this, a queue of movies
        # exhausts HBM (buffers free as in-flight programs finish)
        tl.release_device_arrays()
        queue.append(ax)
        if len(queue) >= depth:
            a = queue.popleft()
            a.assign_ids(astar_paths_cache, assigedIDs_cache)
            results.append(a)
    while queue:
        a = queue.popleft()
        a.assign_ids(astar_paths_cache, assigedIDs_cache)
        results.append(a)
    return results


def visualize_inference(axon_dets, which_dets='IDed', description='',
                        t_y_x_slice=[None, None, None], dets_kwargs=None,
                        scnd_dets_kwargs=None, show=False, axon_subset=None,
                        save_single_tiles=False, animated=False, dpi=160,
                        fps=6, anim_fname_postfix='', draw_true_dets=False,
                        draw_grid=True, draw_scalebar=False,
                        draw_axon_reconstructions=False, draw_trg_paths=None,
                        draw_brightened_bg=False):
    """Render detections on the timelapse (reference interface.py:217-320)."""
    from .viz.video import draw_all
    draw_all(axon_dets,
             which_dets=which_dets,
             description=description,
             t_y_x_slice=t_y_x_slice,
             dets_kwargs=dets_kwargs,
             scnd_dets_kwargs=scnd_dets_kwargs,
             show=show,
             axon_subset=axon_subset,
             save_single_tiles=save_single_tiles,
             animated=animated,
             dpi=dpi,
             fps=fps,
             anim_fname_postfix=anim_fname_postfix,
             draw_true_dets=draw_true_dets,
             draw_grid=draw_grid,
             draw_scalebar=draw_scalebar,
             draw_axon_reconstructions=draw_axon_reconstructions,
             draw_trg_paths=draw_trg_paths,
             draw_brightened_bg=draw_brightened_bg)


def deploy_run(exp_name, run, epoch, dest_dir=None, stnd_scaler=None):
    """Package a training run into a deployment bundle (new capability —
    the reference's deployed_model/ bundle was assembled by hand).

    The standardization scaler is looked up in the run dir and the run's
    CACHE dir (Timelapse writes it to CACHE, Timelapse.py:320-323
    semantics); pass ``stnd_scaler`` explicitly when the run cached
    nothing.
    """
    import pickle
    import shutil
    from .config import OUTPUT_DIR
    from .utils.rundirs import get_run_dir
    from .params import load_parameters, write_parameters
    dest_dir = dest_dir or DEPLOYED_MODEL_DIR
    os.makedirs(dest_dir, exist_ok=True)
    run_dir = get_run_dir(f'{OUTPUT_DIR}/runs/{exp_name}/', run)
    params = load_parameters(exp_name, run)
    params['LOAD_MODEL'] = None
    write_parameters(f'{dest_dir}/params.json', params)
    src_ckpt = f'{run_dir}/models/E{epoch:0>4}'
    dst_ckpt = f'{dest_dir}/E{epoch:0>4}'
    if os.path.exists(dst_ckpt):
        shutil.rmtree(dst_ckpt)
    shutil.copytree(src_ckpt, dst_ckpt)

    scaler_dst = f'{dest_dir}/train_stnd_scaler.pkl'
    if stnd_scaler is not None:
        with open(scaler_dst, 'wb') as f:
            pickle.dump(tuple(stnd_scaler), f)
    else:
        candidates = [f'{run_dir}/train_stnd_scaler.pkl']
        if params.get('CACHE'):
            candidates.append(f'{params["CACHE"]}/train_stnd_scaler.pkl')
        for src in candidates:
            if os.path.exists(src):
                shutil.copy(src, scaler_dst)
                break
        else:
            raise FileNotFoundError(
                'train_stnd_scaler.pkl not found in the run or its CACHE '
                'dir; pass stnd_scaler= (e.g. train_data.stnd_scaler) '
                f'explicitly. Searched: {candidates}')
    # preproc distribution reference for check_preproc, when available
    for cand in (f'{run_dir}/preproc_data/train_preproc_data.csv',):
        if os.path.exists(cand):
            shutil.copy(cand, f'{dest_dir}/train_preproc_data.csv')
    return dest_dir
