"""Split the bench's 'detect' bucket into per-stage wall times on TPU."""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import numpy as np
import jax

import bench
from axtrack_tpu.params import get_default_parameters
from axtrack_tpu.models.yolo import build_model, init_variables

jax.config.update('jax_compilation_cache_dir',
                  os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               '..', '.jax_cache'))
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

n_frames = 8
P = get_default_parameters()
frames, mask, labels = bench.build_workload(T=n_frames)
model = build_model(P)
variables = init_variables(model, P, seed=0)
S = bench.build_tpu_stages(frames, mask, P, model, variables, n_frames)
fr_d, m_d, flat_d, tyx_d = S['args']


def sync(x):
    jax.block_until_ready(x)
    leaf = jax.tree.leaves(x)[0]
    np.asarray(leaf.ravel()[0])


for it in range(3):
    t0 = time.perf_counter()
    flat_tiles = S['stage_pre'](fr_d, m_d, flat_d)
    sync(flat_tiles)
    t1 = time.perf_counter()
    dets = S['stage_det'](flat_tiles, tyx_d)
    sync(dets)
    t2 = time.perf_counter()
    conf_d, xs_d, ys_d, alive_d = dets
    D = S['stage_assoc'](m_d, ys_d, xs_d, alive_d)
    sync(D)
    t3 = time.perf_counter()
    _ = [np.asarray(a) for a in (conf_d, xs_d, ys_d, alive_d, D)]
    t4 = time.perf_counter()
    print(f'iter {it}: pre {t1-t0:.3f}s  det {t2-t1:.3f}s  '
          f'assoc {t3-t2:.3f}s  fetch {t4-t3:.3f}s  total {t4-t0:.3f}s')
