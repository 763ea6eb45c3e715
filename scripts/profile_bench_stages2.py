"""Fine-grained device/RTT breakdown of the bench pipeline (r3).

bench.py's two stage programs measure 96.9 ms (det) + 92.0 ms (assoc)
solo but 168 ms chained — each number mixes tunnel RTT with device
compute. This script separates them: an empty program measures pure
dispatch+fetch RTT; each sub-stage (preproc+tile, CNN, decode+NMS,
chamfer, gathers) is jitted alone on device-resident inputs and timed
min-of-5 with a 1-element fetch, so sub-stage time - RTT ~= device
compute. Drives where the next optimization goes (VERDICT r2 item 2).

Run (TPU must be idle): python scripts/profile_bench_stages2.py
"""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time
import numpy as np


def timed(fn, *args, reps=5):
    """min-of-reps wall time; forces completion with a tiny fetch."""
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0].ravel()[:1])
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0].ravel()[:1])
        best = min(best, time.perf_counter() - t0)
    return best


import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update('jax_compilation_cache_dir',
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), '.jax_cache'))


def main():
    from functools import partial
    from bench import build_workload
    from axtrack_tpu.params import get_default_parameters
    from axtrack_tpu.ops import preproc as PP, tiling as TL
    from axtrack_tpu.ops.decode import decode_tiled, distance_nms
    from axtrack_tpu.ops import geodesic as G
    from axtrack_tpu.ops.geodesic_pallas import batched_windows_probed
    from axtrack_tpu.models.yolo import build_model, init_variables, \
        detect_axons

    n_frames = 8
    P = get_default_parameters()
    frames, mask, _ = build_workload(T=n_frames)
    model = build_model(P)
    variables = init_variables(model, P, seed=0)
    ts = P['TILESIZE']
    MAXD = 64
    window = 512

    ny, nx = TL.n_tiles(mask.shape[0], ts), TL.n_tiles(mask.shape[1], ts)
    mpad = np.zeros((ny * ts, nx * ts), bool)
    mpad[:mask.shape[0], :mask.shape[1]] = mask
    keep = mpad.reshape(ny, ts, nx, ts).any((1, 3))
    flat, tyx = TL.tile_index_table(keep)
    frames_u16 = (np.clip(frames, 0, 1) * 65535).astype(np.uint16)
    centers = np.arange(2, 2 + n_frames, dtype=np.int32)

    fr_d, m_d, flat_d, tyx_d = (jax.device_put(a) for a in
                                (frames_u16, mask, flat, tyx))
    jax.block_until_ready([fr_d, m_d, flat_d, tyx_d])

    # 0) pure dispatch+fetch RTT
    @jax.jit
    def empty(x):
        return x + 1.0
    one = jax.device_put(jnp.zeros((1,), jnp.float32))
    rtt = timed(empty, one)
    print(f'RTT (empty program + 1-elem fetch):  {rtt*1e3:7.1f} ms')

    # 1) preproc + tile
    @jax.jit
    def pre(fr_u16, m, flat_idx):
        x = fr_u16.astype(jnp.float32) / 65535.0
        _, std, _ = PP.nonzero_stats(x)
        proc = PP.preprocess_frames(x, m, 0.0, 55 / 2 ** 16, jnp.mean(std))
        tiles = TL.tile_frames(proc, ts)
        T_all = tiles.shape[0]
        return tiles.reshape(T_all, ny * nx, ts, ts)[:, flat_idx]
    t_pre = timed(pre, fr_d, m_d, flat_d)
    flat_tiles = pre(fr_d, m_d, flat_d)
    jax.block_until_ready(flat_tiles)
    K = flat_tiles.shape[1]
    print(f'preproc+tile ({flat_tiles.shape}):   {t_pre*1e3:7.1f} ms')

    # 2) CNN at DET_CHUNK in {4, 8}
    for DET_CHUNK in (4, 8):
        @jax.jit
        def cnn(ftiles):
            outs = []
            for c0 in range(0, n_frames, DET_CHUNK):
                chunk = centers[c0:c0 + DET_CHUNK]
                Xs = [jnp.moveaxis(jax.lax.dynamic_slice_in_dim(
                          ftiles, int(t) - 2, 5, axis=0), 0, -1)
                      for t in chunk]
                X = jnp.concatenate(Xs, axis=0)
                outs.append(detect_axons(model, variables, X))
            return jnp.concatenate(outs)
        t_cnn = timed(cnn, flat_tiles)
        print(f'CNN 8 frames, chunk={DET_CHUNK}:             '
              f'{t_cnn*1e3:7.1f} ms')
    grids = cnn(flat_tiles).reshape(n_frames, K, 12, 12, 3)
    jax.block_until_ready(grids)

    # 3) decode + NMS (vmapped over frames)
    @jax.jit
    def dec_nms(g):
        dec = jax.vmap(lambda gg: decode_tiled(gg, tyx_d, 0.55, ts,
                                               max_dets=MAXD))(g)
        alive = jax.vmap(lambda c, xx, yy, v: distance_nms(
            c, xx, yy, v, P['NON_MAX_SUPRESSION_DIST']))(
                dec['conf'], dec['x'], dec['y'], dec['valid'])
        return dec['conf'], dec['x'], dec['y'], alive
    t_dec = timed(dec_nms, grids)
    conf_d, xs_d, ys_d, alive_d = dec_nms(grids)
    jax.block_until_ready([conf_d, xs_d, ys_d, alive_d])
    print(f'decode+NMS (vmapped):                {t_dec*1e3:7.1f} ms')

    # 4) chamfer wavefronts alone
    Hp = max(window - mask.shape[0], 0)
    Wp = max(window - mask.shape[1], 0)
    bad = jnp.int32(-10 ** 6)

    @jax.jit
    def chamfer(m, ys, xs, alive):
        padded = jnp.pad(m, ((0, Hp), (0, Wp)))
        yy = jnp.where(alive, ys.astype(jnp.int32), bad).reshape(-1)
        xx = jnp.where(alive, xs.astype(jnp.int32), bad).reshape(-1)
        srcs = jnp.stack([yy, xx], -1)
        return batched_windows_probed(padded, srcs, window, max_sweeps=1)
    t_ch = timed(chamfer, m_d, ys_d, xs_d, alive_d)
    dmaps, origins, convg = chamfer(m_d, ys_d, xs_d, alive_d)
    jax.block_until_ready([dmaps, origins])
    print(f'chamfer ({dmaps.shape}):             {t_ch*1e3:7.1f} ms')

    # 5) pair gathers + pack alone
    pairs = [(s, gap) for s in range(n_frames - 1) for gap in (1, 2)
             if s + gap < n_frames]

    @jax.jit
    def gathers(dm, org, ys, xs, alive):
        yy = jnp.where(alive, ys.astype(jnp.int32), bad).reshape(-1)
        xx = jnp.where(alive, xs.astype(jnp.int32), bad).reshape(-1)
        out = []
        for (s, gap) in pairs:
            t = s + gap
            sl = slice(s * MAXD, (s + 1) * MAXD)
            tg = jnp.stack([yy[t * MAXD:(t + 1) * MAXD],
                            xx[t * MAXD:(t + 1) * MAXD]], -1)
            out.append(G._gather_targets(dm[sl], org[sl], tg,
                                         jnp.float32(500), window))
        return jnp.stack(out)
    t_ga = timed(gathers, dmaps, origins, ys_d, xs_d, alive_d)
    print(f'pair gathers ({len(pairs)} pairs):           {t_ga*1e3:7.1f} ms')

    # 6) full packed fetch cost: assoc-sized output
    D = gathers(dmaps, origins, ys_d, xs_d, alive_d)
    packed = jnp.concatenate([conf_d.ravel().astype(jnp.float32),
                              xs_d.ravel().astype(jnp.float32),
                              ys_d.ravel().astype(jnp.float32),
                              alive_d.ravel().astype(jnp.float32),
                              D.ravel()])
    jax.block_until_ready(packed)
    best = np.inf
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(packed)
        best = min(best, time.perf_counter() - t0)
    print(f'packed fetch ({packed.nbytes/1e3:.0f} KB):           '
          f'{best*1e3:7.1f} ms')


if __name__ == '__main__':
    main()
