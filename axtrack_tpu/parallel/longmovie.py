"""Long-movie sequence parallelism: ONE timelapse sharded across chips.

The reference handles long movies by per-frame host iteration
(AxonDetections.py:111) — strictly sequential. Here the frame axis of a
single movie is sharded over the mesh 'data' axis (SURVEY.md §5
"long-context": shard long movies across chips over ICI):

- detection: each chip preprocesses/tiles/detects its contiguous block of
  center frames; the ±TEMPORAL_CONTEXT context frames at block edges are
  fetched from neighbor chips with one ``jax.lax.ppermute`` halo exchange
  per side (2 frames each — the only cross-chip traffic).
- association: detections are tiny and replicated; each chip builds the
  geodesic wavefront windows (Pallas chamfer) for the sources in ITS frame
  block and gathers the pair distance matrices for lookback gaps
  1..max_gap (default 2 = the reference's MCF_MAX_NUM_MISSES+1).
  Per-chip exactness certificates (geodesic_pallas._locally_consistent)
  come back as one flag per chip.

Everything is expressed with ``shard_map`` — explicit per-device blocks +
explicit collectives — rather than GSPMD annotations, because the halo
pattern (2-frame exchange) and the Pallas kernel are clearer and compile
predictably this way.

Standardization: pass ``var_scalar`` (the deployed train scaler —
production inference standardizes with the TRAIN scaler, interface.py
contract). If None, the movie-global mean of per-frame nonzero stds is
computed with a psum (parity with Timelapse self-standardization).
"""
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
try:
    from jax import shard_map as _shard_map
except ImportError:      # older jax
    from jax.experimental.shard_map import shard_map as _shard_map


def shard_map(f, mesh, in_specs, out_specs, check_rep=False):
    """Version-compat wrapper: jax>=0.8 renamed check_rep -> check_vma
    (and the jax.experimental alias kept the old name)."""
    import inspect
    params = inspect.signature(_shard_map).parameters
    kw = {'check_vma' if 'check_vma' in params else 'check_rep': check_rep}
    return _shard_map(f, mesh=mesh, in_specs=in_specs,
                      out_specs=out_specs, **kw)

from ..ops import preproc as PP
from ..ops import tiling as TL
from ..ops.decode import decode_tiled, distance_nms
from ..models.yolo import detect_axons


def _right_perm(n):
    """ppermute permutation sending each device's payload to its RIGHT
    neighbor (device d -> d+1); device 0 receives zeros."""
    return [(d, d + 1) for d in range(n - 1)]


def _left_perm(n):
    return [(d + 1, d) for d in range(n - 1)]


def build_sharded_detector(mesh, model, variables, params, n_frames,
                           flat_idx, tile_yx, max_dets=64, conf_thr=0.55,
                           var_scalar=None, preprocessed=False,
                           n_real=None, stage=None):
    """Jitted single-movie detector with the FRAME axis sharded over 'data'.

    Args:
      mesh: jax Mesh with a 'data' axis; n_frames % mesh.shape['data'] == 0.
      flat_idx, tile_yx: kept-tile index table (ops.tiling.tile_index_table).
      var_scalar: standardization divisor (train scaler). None -> movie
        stats via psum.
      preprocessed: frames are ALREADY preprocessed float32 (a Timelapse's
        X) — skip normalize/clip/log/standardize so the sharded path is
        numerically identical to the single-chip production path
        (interface.inference(shard_frames=True) route).
      stage: a staged Timelapse's preproc constants
        {'offset', 'lower', 'var', 'log'} (beyond-HBM raw-u16 movies,
        data/timelapse.py staged mode). Frames arrive as the staged
        masked/padded uint16 host movie; each chip runs the EXACT staged
        chain (ops.preproc.staged_preprocess_u16) on its block after the
        u16 halo exchange — numerically identical to the single-chip
        staged path, at 2 bytes/px of ICI halo traffic instead of 4.

    Returns fn(frames_u16 [n_frames, H, W], ctx_lead [tc, H, W],
    ctx_trail [tc, H, W], mask [H, W]) -> (conf, x, y, alive), each
    [n_frames, max_dets]. frames are the CENTER frames; ctx_lead/trail are
    the movie's leading/trailing temporal-context frames (uint16 like
    frames — or f32 when ``preprocessed`` — replicated, tc frames each).
    """
    ts = params['TILESIZE']
    tc = params['TEMPORAL_CONTEXT']
    clip = params['CLIP_LOWERLIM']
    nms_r = params['NON_MAX_SUPRESSION_DIST']
    n_dev = mesh.shape['data']
    assert n_frames % n_dev == 0, (n_frames, n_dev)
    T_loc = n_frames // n_dev
    # the single-hop ppermute halo ships tc frames from each neighbor; a
    # chip must own at least tc frames or the halo (and the context
    # dynamic_slice) silently under-fills — long_movie_pipeline pads the
    # movie so T_loc >= tc before calling this builder
    assert T_loc >= tc, (
        f'frames-per-chip {T_loc} < temporal context {tc}: pad the frame '
        f'count so each chip owns >= tc frames')
    if n_real is None:
        n_real = n_frames     # no padding: every frame is real
    flat_idx = jnp.asarray(flat_idx)
    tyx = jnp.asarray(tile_yx)

    def body(fr_loc_u16, ctx_lead, ctx_trail, m):
        # fr_loc_u16: [T_loc, H, W] this chip's center frames
        idx = jax.lax.axis_index('data')
        if preprocessed or stage is not None:
            # staged mode keeps RAW u16 through the halo exchange (half
            # the ICI bytes; the preproc chain is elementwise so block
            # order vs exchange order is irrelevant)
            x = fr_loc_u16
            lead, trail = ctx_lead, ctx_trail
        else:
            x = fr_loc_u16.astype(jnp.float32) / 65535.0
            lead = ctx_lead.astype(jnp.float32) / 65535.0
            trail = ctx_trail.astype(jnp.float32) / 65535.0

        # halo exchange: last tc frames -> right neighbor, first tc -> left
        from_left = jax.lax.ppermute(x[-tc:], 'data', _right_perm(n_dev))
        from_right = jax.lax.ppermute(x[:tc], 'data', _left_perm(n_dev))
        left = jnp.where(idx == 0, lead, from_left)
        right = jnp.where(idx == n_dev - 1, trail, from_right)
        block = jnp.concatenate([left, x, right], axis=0)  # [T_loc+2tc,H,W]

        if preprocessed:
            proc = block
        elif stage is not None:
            # the canonical staged chain with the dataset's constants —
            # bit-identical to _detect_fused's _staged_range_tiles route
            proc = PP.staged_preprocess_u16(
                block, jnp.float32(stage['offset']),
                jnp.float32(stage['lower']), jnp.float32(stage['var']),
                log_correct=bool(stage['log']))
        else:
            if var_scalar is not None:
                vs = jnp.float32(var_scalar)
            else:
                # movie-global mean of per-frame nonzero stds, each frame
                # counted once: own block + edge context on the edge chips
                _, std_own, _ = PP.nonzero_stats(x)
                _, std_lead, _ = PP.nonzero_stats(lead)
                _, std_trail, _ = PP.nonzero_stats(trail)
                part = (std_own.sum()
                        + jnp.where(idx == 0, std_lead.sum(), 0.0)
                        + jnp.where(idx == n_dev - 1, std_trail.sum(), 0.0))
                # denominator counts REAL frames only: zero pad frames
                # contribute 0 to the sums (all-zero nonzero_stats is 0)
                # and trail-content pad frames replace the trailing-halo
                # rows they consumed, so each real frame is summed once
                vs = jax.lax.psum(part, 'data') / (n_real + 2 * tc)

            proc = PP.preprocess_frames(block, m, 0.0, clip, vs)
        tiles = TL.tile_frames(proc, ts)
        T_all, ny, nx = tiles.shape[:3]
        flat_tiles = tiles.reshape(T_all, ny * nx, ts, ts)[:, flat_idx]

        def per_frame(c):
            Xc = jax.lax.dynamic_slice_in_dim(flat_tiles, c, 2 * tc + 1,
                                              axis=0)
            Xc = jnp.moveaxis(Xc, 0, -1)
            grid = detect_axons(model, variables, Xc)
            dets = decode_tiled(grid, tyx, conf_thr, ts, max_dets=max_dets)
            alive = distance_nms(dets['conf'], dets['x'], dets['y'],
                                 dets['valid'], nms_r)
            # pre-NMS decode count: == max_dets iff the decode slots
            # saturated (the only case where the sharded path can drop
            # detections vs single-chip) — NMS may thin `alive` below the
            # cap afterwards, so callers must not infer saturation from it
            n_dec = dets['valid'].sum().astype(jnp.int32)
            return dets['conf'], dets['x'], dets['y'], alive, n_dec

        return jax.lax.map(per_frame, jnp.arange(T_loc, dtype=jnp.int32))

    fn = shard_map(
        body, mesh=mesh,
        in_specs=(P('data'), P(), P(), P()),
        out_specs=(P('data'),) * 5,
        check_rep=False)
    return jax.jit(fn)


def build_sharded_assoc(mesh, n_frames, window=512, max_dets=64,
                        max_gap=2, max_dist=500.0, max_sweeps=8,
                        interpret=False, backend=None):
    """Jitted association-distance stage with SOURCE FRAMES sharded over
    'data': each chip runs the chamfer wavefront for the detections in its
    frame block and gathers lookback-pair distance matrices.

    Returns fn(mask_padded [Hp, Wp] bool, x, y, alive [n_frames, max_dets])
    -> (D [n_frames, max_gap, max_dets, max_dets] f32 — D[s, g-1] is the
    source-frame-s vs target-frame-(s+g) matrix, capped at max_dist;
    entries for s+g >= n_frames are all max_dist —, ok [n_dev] bool
    per-chip exactness certificates).

    Detections are tiny, so they arrive replicated; only the chamfer work
    (the expensive part) is sharded.

    backend: 'pallas' (TPU Mosaic kernel), 'lax' (pure-XLA sweeps — the
    right choice on CPU meshes, where interpret-mode Pallas inside
    shard_map is orders of magnitude slower than compiled lax), or None to
    pick by jax.default_backend(). Both paths return the same
    local-consistency exactness certificate.
    """
    from ..ops.geodesic import _gather_targets, _batched_windows
    from ..ops import geodesic_pallas as GP

    if backend is None:
        backend = 'pallas' if jax.default_backend() == 'tpu' else 'lax'
    n_dev = mesh.shape['data']
    assert n_frames % n_dev == 0, (n_frames, n_dev)
    T_loc = n_frames // n_dev
    bad = jnp.int32(-10 ** 6)

    def body(mask_padded, xs, ys, alive):
        idx = jax.lax.axis_index('data')
        s0 = idx * T_loc
        yy = jnp.where(alive, ys.astype(jnp.int32), bad)   # [n_frames, D]
        xx = jnp.where(alive, xs.astype(jnp.int32), bad)
        y_loc = jax.lax.dynamic_slice_in_dim(yy, s0, T_loc, 0).reshape(-1)
        x_loc = jax.lax.dynamic_slice_in_dim(xx, s0, T_loc, 0).reshape(-1)
        srcs = jnp.stack([y_loc, x_loc], -1)            # [T_loc*D, 2]
        if backend == 'pallas':
            dmaps, origins, ok = GP.batched_windows_probed(
                mask_padded, srcs, window, max_sweeps=max_sweeps,
                interpret=interpret)
        else:
            dmaps, origins = _batched_windows(mask_padded, srcs, window,
                                              max_sweeps)
            N, Np, orgs, local = GP._pad_srcs(mask_padded, srcs, window)
            crops = GP._crops_for(mask_padded, orgs, local, window, Np)
            ok = GP._locally_consistent(dmaps, crops[:N])

        def per_src_frame(s_loc):
            sl = s_loc * max_dets
            dm = jax.lax.dynamic_slice_in_dim(dmaps, sl, max_dets, 0)
            org = jax.lax.dynamic_slice_in_dim(origins, sl, max_dets, 0)

            def per_gap(g):
                t = s0 + s_loc + g
                t_ok = t < n_frames
                t_safe = jnp.minimum(t, n_frames - 1)
                ty = jax.lax.dynamic_slice_in_dim(yy, t_safe, 1, 0)[0]
                tx = jax.lax.dynamic_slice_in_dim(xx, t_safe, 1, 0)[0]
                tg = jnp.stack([ty, tx], -1)
                D = _gather_targets(dm, org, tg, jnp.float32(max_dist),
                                    window)
                return jnp.where(t_ok, D, jnp.float32(max_dist))

            return jax.lax.map(per_gap,
                               jnp.arange(1, max_gap + 1, dtype=jnp.int32))

        D = jax.lax.map(per_src_frame,
                        jnp.arange(T_loc, dtype=jnp.int32))
        return D, ok.reshape(1)

    fn = shard_map(
        body, mesh=mesh,
        in_specs=(P(), P(), P(), P()),
        out_specs=(P('data'), P('data')),
        check_rep=False)
    return jax.jit(fn)


def pad_mask_for_windows(mask, window):
    """Zero-pad a bool mask so both dims are >= window (chamfer crops)."""
    Hp = max(window - mask.shape[0], 0)
    Wp = max(window - mask.shape[1], 0)
    return np.pad(np.asarray(mask), ((0, Hp), (0, Wp)))


def long_movie_pipeline(mesh, model, variables, params, frames_u16, mask,
                        max_dets=64, window=512, max_sweeps=8,
                        var_scalar=None, interpret=False, backend=None,
                        flat_idx=None, tile_yx=None, conf_thr=0.55,
                        preprocessed=False, max_gap=2, max_dist=500.0,
                        stage=None):
    """End-to-end sharded detect + associate for one long movie.

    frames_u16: uint16 [T_total, H, W] INCLUDING tc leading/trailing
    context frames (T_total = n_frames + 2*tc) — or preprocessed f32
    frames with ``preprocessed=True`` (the interface.inference
    shard_frames route), or a staged dataset's masked raw u16 with
    ``stage=ds._stage`` (beyond-HBM movies: per-chip on-device preproc,
    T/n_dev frames of HBM per chip instead of the whole movie). Returns
    (frame_dets list of dicts, astar_dists {(t, gap): [n_s, n_t]}, ok)
    in the host format detections.py/track.tracker consume.

    flat_idx/tile_yx: kept-tile table; None derives it from the mask
    (pass the dataset's content-based table for production parity).
    """
    tc = params['TEMPORAL_CONTEXT']
    ts = params['TILESIZE']
    n_real = frames_u16.shape[0] - 2 * tc
    H, W = frames_u16.shape[1:]
    if flat_idx is None:
        ny, nx = TL.n_tiles(H, ts), TL.n_tiles(W, ts)
        mpad = np.zeros((ny * ts, nx * ts), bool)
        mpad[:H, :W] = np.asarray(mask)
        keep = mpad.reshape(ny, ts, nx, ts).any((1, 3))
        flat_idx, tile_yx = TL.tile_index_table(keep)
    tyx = tile_yx

    # pad the frame count to a multiple of the chip count AND so every
    # chip owns >= tc frames (the ppermute halo is single-hop). Pad frames
    # consume the trailing-context content first and the trailing halo is
    # SHIFTED past the consumed frames (trail[pad_n:] + zeros) — so every
    # REAL frame keeps its true temporal context regardless of pad_n —
    # then zeros; pad-frame outputs are trimmed below. Zero frames
    # contribute 0 to the self-standardization psum (nonzero_stats of an
    # all-zero frame is 0), so with the real-frame denominator (n_real +
    # 2*tc, passed via n_real) the movie scalar matches the unpadded run.
    frames_np = np.asarray(frames_u16)
    centers_np = frames_np[tc:tc + n_real]
    lead_np = frames_np[:tc]
    trail_np = frames_np[tc + n_real:]
    n_dev = mesh.shape['data']
    n_frames = n_dev * max(tc, -(-n_real // n_dev))
    pad_n = n_frames - n_real
    if pad_n:
        zeros = np.zeros((max(pad_n, tc), H, W), frames_np.dtype)
        centers_np = np.concatenate(
            [centers_np, trail_np[:pad_n], zeros[:max(0, pad_n - tc)]])
        trail_np = np.concatenate([trail_np[pad_n:], zeros])[:tc]

    detect = build_sharded_detector(mesh, model, variables, params,
                                    n_frames, flat_idx, tyx,
                                    max_dets=max_dets, conf_thr=conf_thr,
                                    var_scalar=var_scalar,
                                    preprocessed=preprocessed,
                                    n_real=n_real, stage=stage)
    assoc = build_sharded_assoc(mesh, n_frames, window=window,
                                max_dets=max_dets, max_sweeps=max_sweeps,
                                max_gap=max_gap, max_dist=max_dist,
                                interpret=interpret, backend=backend)

    centers = jnp.asarray(centers_np)
    lead = jnp.asarray(lead_np)
    trail = jnp.asarray(trail_np)
    m = jnp.asarray(np.asarray(mask, bool))
    conf, x, y, alive, n_dec = detect(centers, lead, trail, m)
    D, ok = assoc(jnp.asarray(pad_mask_for_windows(mask, window)),
                  x, y, alive)
    conf, x, y, alive, n_dec, D = (np.asarray(a) for a in
                                   (conf, x, y, alive, n_dec, D))

    frame_dets = []
    for t in range(n_real):                   # pad-frame outputs discarded
        k = alive[t]
        frame_dets.append({'conf': conf[t][k].astype(np.float32),
                           'x': x[t][k].astype(np.int32),
                           'y': y[t][k].astype(np.int32),
                           'n_decoded': int(n_dec[t])})
    astar_dists = {}
    for s in range(n_real):
        for g in range(1, max_gap + 1):
            t = s + g
            if t < n_real:
                astar_dists[(t, g)] = D[s, g - 1][alive[s]][:, alive[t]]
    return frame_dets, astar_dists, np.asarray(ok)
