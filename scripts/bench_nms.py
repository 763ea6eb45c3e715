"""Production-cap NMS benchmark (VERDICT r1 item 10 / weak #8).

Round 1's greedy NMS was a 1024-step sequential fori_loop; the bench only
measured MAXD=64, hiding the production MAX_DETS_PER_FRAME=1024 cost. The
NMS is now a parallel Jacobi fixpoint (ops/decode.distance_nms) whose round
count is the suppression-chain depth, not n. Measured on TPU: both caps sit
inside the ~50ms tunnel dispatch overhead (compute <= a few ms), i.e. the
production cap is NOT a bottleneck anymore.
"""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import json
import time

import numpy as np
import jax
import jax.numpy as jnp

from axtrack_tpu.ops.decode import distance_nms


def bench_n(n, radius=23.0, seed=0):
    rng = np.random.default_rng(seed)
    ys = rng.integers(0, 2920, n).astype(np.float32)
    # points every ~8px along channel rows -> suppression chains
    xs = ((np.arange(n) * 8) % 6364 + rng.integers(0, 4, n)).astype(np.float32)
    conf = np.sort(rng.random(n))[::-1].copy().astype(np.float32)
    valid = np.ones(n, bool)
    args = [jax.device_put(jnp.asarray(a)) for a in (conf, xs, ys, valid)]

    fn = jax.jit(lambda c, x, y, v: distance_nms(c, x, y, v, radius).sum())
    out = fn(*args)
    jax.block_until_ready(out)
    best = np.inf
    for _ in range(5):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        np.asarray(out)
        best = min(best, time.perf_counter() - t0)
    return best, int(np.asarray(out))


def main():
    rows = {}
    for n in (64, 1024):
        dt, survivors = bench_n(n)
        rows[n] = {'ms_per_call_incl_dispatch': round(dt * 1e3, 1),
                   'survivors': survivors}
        print(f'# n={n}: {dt*1e3:.1f} ms/call (incl ~50ms tunnel '
              f'dispatch), {survivors} survivors', file=sys.stderr)
    print(json.dumps({'metric': 'nms_ms_per_call', 'by_cap': rows}))


if __name__ == '__main__':
    main()
