"""Isolate the production fused-assoc program cost at prod shapes:
chamfer(n_src bucket) + pair gathers + packed fetch, vs its pieces.
"""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

import bench
from axtrack_tpu.detections import _fused_assoc_program
from axtrack_tpu.ops import geodesic_pallas as GP

frames, mask, labels = bench.build_workload(T=8)
window, Dmax, P_b = 512, 64, 16
n_real = 305
n_src = GP.src_bucket(n_real, window)
print(f'n_src bucket: {n_src}')

rng = np.random.default_rng(0)
ys, xs = np.where(mask)
idx = rng.choice(len(ys), n_src, replace=False)
srcs = np.stack([ys[idx], xs[idx]], -1).astype(np.int32)

Hp = ((mask.shape[0] + 511) // 512) * 512
Wp = ((mask.shape[1] + 511) // 512) * 512
mpad = np.zeros((Hp, Wp), bool)
mpad[:mask.shape[0], :mask.shape[1]] = mask
m_d = jax.device_put(jnp.asarray(mpad))

offs = np.zeros(P_b, np.int32)
tgts = np.full((P_b, Dmax, 2), -10**6, np.int32)
tgts[:, :40] = srcs[:40][None]
packed_in = np.concatenate([srcs.ravel(), offs, tgts.ravel()]).astype(np.int32)
packed_d = jax.device_put(jnp.asarray(packed_in))

run = _fused_assoc_program(window, Dmax, P_b, n_src, 1, 500.0)


def timeit(label, fn, reps=5):
    fn()
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    print(f'{label}: {best*1e3:7.1f} ms')


# full: host input, full fetch
timeit('host-in full-fetch ', lambda: np.asarray(run(m_d, packed_in)))
# device input, full fetch
timeit('dev-in  full-fetch ', lambda: np.asarray(run(m_d, packed_d)))
# device input, 1-elem fetch
timeit('dev-in  tiny-fetch ', lambda: np.asarray(run(m_d, packed_d)[:1]))

# chamfer alone (probed), tiny fetch
probed = jax.jit(lambda m, s: GP.batched_windows_probed(
    m, s, window, max_sweeps=1)[0])
s_d = jax.device_put(jnp.asarray(srcs))
timeit('chamfer-only probed', lambda: np.asarray(probed(m_d, s_d)[0, 0, :1]))

# chamfer at the old pow2 bucket (512) for comparison
idx2 = rng.choice(len(ys), 512, replace=False)
s512 = jax.device_put(jnp.asarray(
    np.stack([ys[idx2], xs[idx2]], -1).astype(np.int32)))
timeit('chamfer 512 windows', lambda: np.asarray(probed(m_d, s512)[0, 0, :1]))
