"""Why does the 1-sweep certificate fail on real production detections?
Dumps dets once (slow Timelapse build), then analyzes failing windows.
"""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

DUMP = '/tmp/prod_dets_dump.npz'

if not os.path.exists(DUMP):
    import tempfile
    import axtrack_tpu as axtrack
    from axtrack_tpu.data.timelapse import Timelapse
    from axtrack_tpu.detections import AxonDetections
    cache_dir = '/root/repo/.jax_cache'
    fxdir = os.path.join(cache_dir, 'prod_fixture_8')
    P, (model, variables), scaler = axtrack.setup_inference(
        tempfile.mkdtemp(prefix='dbg_'))
    tl = Timelapse(
        imseq_path=os.path.join(fxdir, 'movie.tif'), labels_csv=None,
        mask_path=os.path.join(fxdir, 'movie_mask.npy'),
        timepoints=None, offset=None, log_correct=True,
        standardize_framewise=False, standardize=scaler,
        name='dbg', use_transforms=[], contrast_llim=55,
        plot=False, pad=None, Sy=P['SY'], Sx=P['SX'],
        tilesize=P['TILESIZE'], cache=None, from_cache=None,
        temporal_context=P['TEMPORAL_CONTEXT'])
    ax = AxonDetections((model, variables), tl, P, directory=None)
    ax.detect_dataset()
    dets = ax._frame_det_arrays()
    np.savez(DUMP,
             mask=np.asarray(tl.mask, bool),
             **{f'y{t}': d['y'] for t, d in enumerate(dets)},
             **{f'x{t}': d['x'] for t, d in enumerate(dets)})
    print('dumped')

z = np.load(DUMP)
mask = z['mask']
T = sum(1 for k in z.files if k.startswith('y'))
ys = np.concatenate([z[f'y{t}'] for t in range(T - 1)])
xs = np.concatenate([z[f'x{t}'] for t in range(T - 1)])
print(f'{len(ys)} srcs; on-mask: {mask[ys, xs].sum()}/{len(ys)}')

from axtrack_tpu.ops import geodesic_pallas as GP
window = 512
n_src = GP.src_bucket(len(ys), window)
ys_p = np.concatenate([ys, np.full(n_src - len(ys), ys[-1])])
xs_p = np.concatenate([xs, np.full(n_src - len(ys), xs[-1])])
srcs = np.stack([ys_p, xs_p], -1).astype(np.int32)
m_d = jax.device_put(jnp.asarray(mask))


@jax.jit
def probe(m, s):
    N, Np, origins, local = GP._pad_srcs(m, s, window)
    crops = GP._crops_for(m, origins, local, window, Np)
    dmaps = GP._launch(local, crops, window, 1, False)
    big = jnp.float32(GP.INF)
    up = jnp.concatenate([jnp.full_like(dmaps[:, :1, :], big),
                          dmaps[:, :-1, :]], axis=1)
    down = jnp.concatenate([dmaps[:, 1:, :],
                            jnp.full_like(dmaps[:, :1, :], big)], axis=1)
    left = jnp.concatenate([jnp.full_like(dmaps[:, :, :1], big),
                            dmaps[:, :, :-1]], axis=2)
    right = jnp.concatenate([dmaps[:, :, 1:],
                             jnp.full_like(dmaps[:, :, :1], big)], axis=2)
    nb = jnp.minimum(jnp.minimum(up, down), jnp.minimum(left, right))
    bad = (crops > 0.5) & (dmaps > nb + 1.5) & (dmaps > 0.5)
    return bad, dmaps, origins

bad, dmaps, origins = probe(m_d, jnp.asarray(srcs))
bad_n = np.asarray(bad.sum(axis=(1, 2)))
idx = np.where(bad_n > 0)[0]
print(f'windows with bad cells: {len(idx)}/{n_src}')
for i in idx[:8]:
    by, bx = np.where(np.asarray(bad[i]))
    oy, ox = np.asarray(origins[i])
    sy, sx = srcs[i]
    print(f'  win {i}: src=({sy},{sx}) on_mask={mask[sy, sx]} '
          f'origin=({oy},{ox}) {len(by)} bad cells; first bad '
          f'local=({by[0]},{bx[0]}) global=({oy + by[0]},{ox + bx[0]}) '
          f'd={np.asarray(dmaps[i, by[0], bx[0]]):.0f}')
    # neighborhood of first bad cell
    y0, x0 = by[0], bx[0]
    sl = np.asarray(dmaps[i, max(0, y0-2):y0+3, max(0, x0-2):x0+3])
    print('   d nbhd:\n', np.where(sl > 1e8, -1, sl).astype(int))
    msl = mask[oy + max(0, y0-2):oy + y0+3, ox + max(0, x0-2):ox + x0+3]
    print('   mask nbhd:\n', msl.astype(int))
