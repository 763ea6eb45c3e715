"""Standalone timing of the Pallas chamfer kernel at bench shapes."""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import numpy as np
import jax
import jax.numpy as jnp

import bench
from axtrack_tpu.ops import geodesic_pallas as GP

if os.environ.get('SRC_BLOCK'):
    GP.SRC_BLOCK = int(os.environ['SRC_BLOCK'])

n_frames = 8
frames, mask, labels = bench.build_workload(T=n_frames)
window = 512
MAXD = 64
rng = np.random.default_rng(0)
ys, xs = np.where(mask)
srcs = []
for t in range(n_frames):
    idx = rng.choice(len(ys), MAXD, replace=False)
    srcs.append(np.stack([ys[idx], xs[idx]], -1))
srcs = np.concatenate(srcs).astype(np.int32)      # [512, 2]

Hp = ((mask.shape[0] + 511) // 512) * 512
Wp = ((mask.shape[1] + 511) // 512) * 512
mpad = np.zeros((Hp, Wp), bool)
mpad[:mask.shape[0], :mask.shape[1]] = mask
m_d = jax.device_put(mpad)
s_d = jax.device_put(srcs)

for sweeps in (1, 2):
    fn = jax.jit(lambda m, s: GP.batched_windows_pallas(
        m, s, window, max_sweeps=sweeps)[0])
    out = fn(m_d, s_d)
    jax.block_until_ready(out)
    np.asarray(out.ravel()[0])
    best = np.inf
    for _ in range(4):
        t0 = time.perf_counter()
        out = fn(m_d, s_d)
        jax.block_until_ready(out)
        np.asarray(out.ravel()[0])
        best = min(best, time.perf_counter() - t0)
    print(f'SRC_BLOCK={GP.SRC_BLOCK} sweeps={sweeps}: {best*1e3:.1f} ms '
          f'for {len(srcs)} windows of {window}')
