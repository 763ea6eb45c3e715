"""Chunk-resident training epochs for beyond-HBM movies (VERDICT r2 item 1).

The reference trains its deployed model on 323 frames of 2920x6364 f32 —
~24 GB of movie (reference deployed_model/params.txt:6,25-26;
experiment/experiment.py:75-112) — which exceeds one chip's HBM. Round 2's
fallback streamed f32 batches through the host tunnel (~50 MB/s on
incompressible data): correct but ~100x slower than the device-resident
scan. This module replaces it with the fast path:

- the host keeps the movie as RAW uint16 (data/timelapse.py staged mode;
  half the bytes, and the tunnel moves compressible integer data ~20x
  faster than f32 noise),
- each epoch walks the frame axis in chunks: ONE u16 host->device ship per
  chunk, then a single fused jitted program per chunk does
  normalize -> offset/clip/log/standardize -> augmentation transform ->
  tile -> kept-tile gather -> lax.scan over every full batch of that chunk
  (forward + backward + Adam update on device),
- augmentation parameters are traced runtime values
  (data/augment.transform_frames_dynamic), so a fresh per-epoch draw does
  NOT recompile the chunk program.

Shuffle semantics: the reference's DataLoader shuffles (frame, tile) pairs
globally (core_functionality.py:99-107). Beyond HBM a global shuffle would
make every batch touch the whole movie; instead chunk ORDER is shuffled and
pairs are shuffled WITHIN a chunk (locality-constrained shuffling, the
standard webdataset/shard-shuffle compromise). With SHUFFLE=False the pair
order is identical to the streaming loop over the same plan — the equality
test (tests/test_bigmovie.py) exploits that.

DROP_LAST semantics: chunk lengths are aligned so every non-tail chunk's
pair count divides the batch size evenly — only the tail chunk carries a
(< BATCH_SIZE) remainder, so at most BATCH_SIZE-1 pairs are dropped per
EPOCH, like the in-memory loaders. (If the HBM budget allows fewer frames
than the alignment step bs/gcd(K, bs), chunks fall back to the unaligned
length and each may drop a remainder.)
"""
import os

import numpy as np
import pandas as pd
import jax
import jax.numpy as jnp

from ..ops import tiling as TL
from ..ops.preproc import staged_preprocess_u16
from ..data.augment import transform_frames_dynamic


def plan_chunks(dataset, P, shuffle=None, chunk_budget=None):
    """Build one epoch's chunk plan.

    Returns (chunks, K): chunks is a list of dicts with
      lo/hi   — frame range (indices into the staged u16 movie, incl. halo)
      t0/t1   — center-timepoint range [t0, t1) covered by the chunk
      batches — i32[n_full, BATCH_SIZE] global flat (t * K + tile) indices
      rest    — i32[r] leftover pairs (< one batch)
    Pair indices use the same global flat scheme as the in-memory loaders
    (engine.setup_data_loaders), so plans can be replayed through the
    streaming path for equality testing.
    """
    K = dataset.ntiles_kept
    tp = np.asarray(dataset.timepoints_indices)
    T = dataset.sizet
    tc = dataset.temporal_context
    H, W, ts = dataset.sizey, dataset.sizex, dataset.tilesize
    # device working set per frame: kept tiles (f32) + preproc'd and
    # transformed frame copies (f32) + the raw u16 frame
    per_frame = K * ts * ts * 4 + H * W * 10
    budget = int(chunk_budget or os.environ.get('AXTRACK_CHUNK_BUDGET',
                                                2_500_000_000))
    resident = getattr(dataset, '_X_u16_dev', None)
    if resident is not None and resident.nbytes > 1_000_000_000:
        # the resident raw movie shares HBM with the chunk working set:
        # leave room (v5e: 16GB; ~1.2GB model/opt/grads/transients)
        budget = max(300_000_000,
                     min(budget, 15_200_000_000 - resident.nbytes
                         - 1_200_000_000))
    C_t = max(1, min(T, budget // per_frame))
    bs = P['BATCH_SIZE']
    if P['DROP_LAST'] and C_t < T:
        # align the chunk length so each non-tail chunk's pair count
        # (C_t * K) is a multiple of the batch size: DROP_LAST then drops
        # only the tail chunk's < bs remainder (<= bs-1 pairs per EPOCH,
        # matching the in-memory loaders) instead of <= bs-1 pairs per
        # CHUNK, which would systematically under-train reshuffled tiles
        step = bs // int(np.gcd(K, bs))      # smallest c with c*K % bs == 0
        if step <= C_t:
            C_t = (C_t // step) * step
    if shuffle is None:
        shuffle = P['SHUFFLE']

    starts = np.arange(0, T, C_t)
    if shuffle:
        np.random.shuffle(starts)
    chunks = []
    for t0 in starts:
        t1 = int(min(t0 + C_t, T))
        t0 = int(t0)
        lo = int(tp[t0:t1].min() - tc)
        hi = int(tp[t0:t1].max() + tc + 1)
        pairs = (np.arange(t0, t1)[:, None] * K
                 + np.arange(K)[None]).ravel().astype(np.int64)
        if shuffle:
            np.random.shuffle(pairs)
        n_full = len(pairs) // bs
        chunks.append(dict(t0=t0, t1=t1, lo=lo, hi=hi,
                           batches=pairs[:n_full * bs].reshape(n_full, bs),
                           rest=pairs[n_full * bs:]))
    return chunks, K


def _get_chunk_prog(state, dataset, P, which_dataset):
    """Fused per-chunk program, cached on the TrainState (a fresh function
    object per chunk/epoch would retrace; shapes key the jit cache)."""
    cache = getattr(state, '_chunk_progs', None)
    if cache is None:
        cache = state._chunk_progs = {}
    s = dataset._stage
    ts = dataset.tilesize
    nyx = dataset.ytiles * dataset.xtiles
    tc = dataset.temporal_context
    mesh = getattr(state, 'mesh', None)
    # key by the VALUES run_chunk bakes in (not id(dataset): a recycled
    # id after the old dataset is collected would silently reuse stale
    # stage constants) — equal key => identical traced program
    key = (which_dataset, float(s['offset']), float(s['lower']),
           float(s['var']), bool(s['log']), ts, nyx, tc, mesh)
    if key in cache:
        return cache[key]

    train_step, eval_step = state._steps
    offset, lower, var = s['offset'], s['lower'], s['var']
    log_correct = s['log']
    if mesh is not None:
        from ..parallel.mesh import (dp_constrain, frames_constrain,
                                     replicate_constrain)
    else:
        def dp_constrain(x, _mesh):
            return x
        frames_constrain = replicate_constrain = dp_constrain

    @jax.jit
    def run_chunk(params, batch_stats, opt_state, u16, flat_idx, dy, dx,
                  fy, fx, angle, t0, centers, targets_chunk, idx_batches):
        # flat_idx (the epoch's kept-tile table) is an ARGUMENT, not a
        # closure constant: augmentation redraws change the keep set per
        # epoch, and a baked first-epoch table would silently train the
        # wrong tiles. Its length K keys the jit cache (a handful of
        # distinct K values over a run -> a handful of compiles).
        K = flat_idx.shape[0]
        # the canonical staged preproc chain, traced in this jit so XLA
        # fuses it with the transform. Mesh epochs shard the chain's frame
        # axis over 'data' (frames are independent through preproc ->
        # transform -> tiling; the rotation gather — the chain's dominant
        # term, ~710 ms/chunk at deployed scale, BASELINE.md — divides by
        # dp instead of replicating), then all-gather the kept tiles ONCE
        # before the batch scan needs arbitrary (frame, tile) pairs.
        u16 = frames_constrain(u16, mesh)
        x = staged_preprocess_u16(u16, offset, lower, var,
                                  log_correct=log_correct)
        x = transform_frames_dynamic(x, dy, dx, fy, fx, angle)
        tiles = TL.tile_frames(x, ts).reshape(x.shape[0], nyx, ts, ts)
        tiles = tiles[:, flat_idx]                    # [Tc_all, K, ts, ts]
        tiles = replicate_constrain(tiles, mesh)

        def gather(idx):
            t_g, k = jnp.divmod(idx, K)
            ctx = centers[t_g - t0][:, None] + jnp.arange(-tc, tc + 1)[None]
            X = tiles[ctx, k[:, None]]                # [B, C_f, ts, ts]
            X = jnp.moveaxis(X, 1, -1)                # NHWC
            # mesh epochs: batch axis data-parallel (engine._make_scan_epoch
            # has the same annotation; grads psum'd by XLA)
            return (dp_constrain(X, mesh),
                    dp_constrain(targets_chunk[t_g - t0, k], mesh))

        def step(carry, idx):
            params, bstats, opt = carry
            X, tgt = gather(idx)
            if which_dataset == 'train':
                params, bstats, opt, _loss, comps = train_step(
                    params, bstats, opt, X, tgt)
            else:
                _loss, comps = eval_step(params, bstats, X, tgt)
            return (params, bstats, opt), comps

        (params, batch_stats, opt_state), comps = jax.lax.scan(
            step, (params, batch_stats, opt_state), idx_batches)
        return params, batch_stats, opt_state, comps

    cache[key] = run_chunk
    return run_chunk


def run_epoch_chunked(state, dataset, which_dataset, P, plan=None):
    """One chunk-resident epoch over a staged beyond-HBM dataset.

    Semantics per batch are identical to engine.run_epoch /
    run_epoch_device (same gather, same train_step); only the batch ORDER
    is chunk-major (module docstring). Returns the per-batch
    loss-component DataFrame like engine.run_epoch.
    """
    assert dataset._chunk_epoch is not None, \
        'construct_tiles() has not prepared a chunked epoch'
    # resident-u16 fast path: the raw movie ships to HBM once (first call)
    # and every chunk below slices it on-device — zero per-epoch host
    # traffic (the tunnel moves ~20MB/s here; reference-scale movies are
    # ~12GB raw)
    dataset.ensure_resident_u16()
    ce = dataset._chunk_epoch
    chunks, K = plan if plan is not None else plan_chunks(dataset, P)
    prog = _get_chunk_prog(state, dataset, P, which_dataset)
    tp = np.asarray(dataset.timepoints_indices)
    targets_all = jnp.asarray(dataset.target_tiled)
    flat_idx = jnp.asarray(dataset._tile_flat_idx)
    mesh = getattr(state, 'mesh', None)
    if mesh is not None:
        # chunk inputs must live on the mesh's device set next to the
        # sharded params. Targets/indices are small and consumed
        # replicated; the u16 chunk itself is placed FRAME-SHARDED (see
        # fetch_chunk) to match run_chunk's frames_constrain — a
        # replicated put would broadcast the full chunk to every chip
        # only for GSPMD to drop (dp-1)/dp of it at the first constraint.
        from ..parallel.mesh import replicate_put
        targets_all, flat_idx = replicate_put((targets_all, flat_idx), mesh)
        from jax.sharding import NamedSharding, PartitionSpec
    tparams = (np.int32(ce['dy']), np.int32(ce['dx']),
               np.bool_(ce['flip_y']), np.bool_(ce['flip_x']),
               np.float32(ce['angle']))

    all_comps = []
    print(f'LOSS (chunked, {len(chunks)} chunks): ', end='', flush=True)

    def fetch_chunk(lo, hi):
        u16 = dataset.staged_chunk(lo, hi)
        if mesh is not None:
            # frame-sharded over 'data', matching run_chunk's
            # frames_constrain: each chip receives only its Tc/dp frames
            # instead of a full-chunk broadcast that GSPMD would
            # immediately re-shard. device_put (unlike the in-jit
            # constraint, which GSPMD pads) REQUIRES divisibility, so
            # ragged chunks (frame count % dp != 0) fall back to the
            # replicated put — frames_constrain re-shards them inside
            # the jit either way; only the transfer optimization is
            # skipped. Resident slices arrive committed to one device
            # and must be re-placed regardless.
            if u16.shape[0] % mesh.shape['data'] == 0:
                u16 = jax.device_put(u16, NamedSharding(
                    mesh, PartitionSpec('data', None, None)))
            else:
                from ..parallel.mesh import replicate_put
                u16 = replicate_put(u16, mesh)
        return u16

    u16 = fetch_chunk(chunks[0]['lo'], chunks[0]['hi'])
    for i, ch in enumerate(chunks):
        centers = jnp.asarray(tp[ch['t0']:ch['t1']] - ch['lo'], jnp.int32)
        targets_chunk = targets_all[jnp.asarray(tp[ch['t0']:ch['t1']])]
        batch_sets = []
        if len(ch['batches']):
            batch_sets.append(ch['batches'])
        if len(ch['rest']) and not P['DROP_LAST']:
            batch_sets.append(ch['rest'][None, :])
        chunk_comps = []
        for idx_batches in batch_sets:
            (state.params, state.batch_stats, state.opt_state,
             comps) = prog(state.params, state.batch_stats,
                           state.opt_state, u16, flat_idx, *tparams,
                           np.int32(ch['t0']), centers, targets_chunk,
                           jnp.asarray(idx_batches))
            chunk_comps.append((idx_batches.shape[0], comps))
        # prefetch the NEXT chunk while this one computes: dispatch above
        # is async, so the u16 host->device ship rides alongside the chunk
        # program instead of serializing after it
        if i + 1 < len(chunks):
            nxt = chunks[i + 1]
            u16_next = fetch_chunk(nxt['lo'], nxt['hi'])
        for nb, comps in chunk_comps:
            comps = jax.tree.map(np.asarray, comps)     # blocks on chunk
            for b in range(nb):
                all_comps.append(pd.Series(
                    {k: float(v[b]) for k, v in comps.items()}))
        if i + 1 < len(chunks):
            u16 = u16_next
        if all_comps:   # a chunk can yield no batches under DROP_LAST
            print(f'{all_comps[-1]["total_summed_loss"]:.3f}', end='...',
                  flush=True)
    print(f'Done ({len(all_comps)} batches).')
    if not all_comps:
        return pd.DataFrame()
    return pd.concat(all_comps, axis=1)
