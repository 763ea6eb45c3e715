"""Isolated per-layer conv-stack roofline on the real chip (r4 next #2).

profile_cnn3.py's cumulative-prefix differencing is unusable: each
prefix program materializes a DIFFERENT final activation to HBM (the
1-layer prefix writes the 1.6 GB conv0 map that the full stack never
materializes at f32), so deltas go negative. Here every layer is timed
in ISOLATION — its own jitted program, input materialized at the
layer's true input shape, output forced — which matches the real
stack's cost model because XLA materializes conv boundaries anyway
(BN+leaky-relu fuse into the conv; convs don't fuse with each other).

Per-layer speed-of-light = max(MXU roofline, HBM roofline):
  mxu_sol = FLOPs / (peak * min(Cout,128)/128 * min(9*Cin,128)/128)
            (Cout rides the 128-lane minor axis, the 3x3xCin
             contraction feeds the 128-deep systolic dimension; rows
             N*H'*W' are abundant)
  hbm_sol = (bytes_in + bytes_out) / BW      with BW = 819 GB/s (v5e)

Run on TPU:  python scripts/profile_cnn4.py [N_TILES] [dtype]
"""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')

from axtrack_tpu.params import get_default_parameters  # noqa: E402

P = get_default_parameters()
CONV = P['ARCHITECTURE'][0]
BW = 819e9


def timeit(fn, *args, reps=5):
    """Per-execution device time via the async-dispatch slope.

    block_until_ready is a no-op on the experimental 'axon' tunnel
    platform and a single dispatch carries a ~25 ms tunnel floor, so:
    queue M back-to-back async executions (they serialize on the
    device), force one 1-element fetch, and difference M=2 vs M=10 —
    the floor and the fetch cancel exactly."""
    def run(m):
        out = fn(*args)
        for _ in range(m - 1):
            out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0].ravel()[:1])

    run(2)
    lo = hi = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        run(2)
        lo = min(lo, time.perf_counter() - t0)
        t0 = time.perf_counter()
        run(10)
        hi = min(hi, time.perf_counter() - t0)
    return (hi - lo) / 8


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 312
    dname = sys.argv[2] if len(sys.argv) > 2 else 'bf16'
    dtype = {'f32': jnp.float32, 'bf16': jnp.bfloat16}[dname]
    peak = {'f32': 49e12, 'bf16': 197e12}[dname]
    esize = jnp.dtype(dtype).itemsize
    rng = np.random.default_rng(0)

    # (name, kind, (k,cout,s) or None, in_shape)
    layers = []
    H = W = 512
    cin = 5
    for i, spec in enumerate(CONV):
        if spec == 'M':
            layers.append((f'pool{i}', 'pool', None, (N, H, W, cin)))
            H //= 2
            W //= 2
            continue
        k, cout, s, g = spec
        layers.append((f'conv{i} {cin}->{cout}' + (f' s{s}' if s > 1 else ''),
                       'conv', (k, cout, s), (N, H, W, cin)))
        H //= s
        W //= s
        cin = cout

    def layer_fn(kind, karg):
        if kind == 'pool':
            return jax.jit(lambda x: nn.max_pool(x, (2, 2), (2, 2)))
        k, cout, s = karg

        @jax.jit
        def run(x, w, b, scale):
            y = jax.lax.conv_general_dilated(
                x, w, (s, s), [(1, 1), (1, 1)],
                dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
            return nn.leaky_relu(y * scale + b, negative_slope=0.1)
        return run

    print(f'# N={N} tiles, dtype={dname}, peak={peak/1e12:.0f} TFLOP/s, '
          f'BW={BW/1e9:.0f} GB/s, slope timing (floor cancels)')
    print(f'{"layer":<22}{"in":>15}{"GFLOP":>8}{"GB io":>7}{"ms":>8}'
          f'{"mxuSOL":>8}{"hbmSOL":>8}{"x SOL":>7}')
    total_ms = total_sol = total_flop = 0.0
    for name, kind, karg, (n, h, w_, ci) in layers:
        x = jnp.asarray(rng.random((n, h, w_, ci), np.float32), dtype)
        if kind == 'pool':
            ho, wo, co = h // 2, w_ // 2, ci
            gflop = 0.0
            mxu_sol = 0.0
            t = timeit(layer_fn(kind, karg), x) * 1e3
        else:
            k, cout, s = karg
            ho, wo, co = h // s, w_ // s, cout
            wgt = jnp.asarray(rng.normal(0, .1, (k, k, ci, cout)), dtype)
            b = jnp.asarray(rng.normal(0, 1, cout), dtype)
            sc = jnp.asarray(1 + rng.random(cout), dtype)
            gflop = 2 * n * ho * wo * cout * k * k * ci / 1e9
            lane = min(cout, 128) / 128
            depth = min(k * k * ci, 128) / 128
            mxu_sol = gflop * 1e9 / (peak * lane * depth) * 1e3
            t = timeit(layer_fn(kind, karg), x, wgt, b, sc) * 1e3
        gbio = (n * h * w_ * ci + n * ho * wo * co) * esize / 1e9
        hbm_sol = gbio / BW * 1e12
        sol = max(mxu_sol, hbm_sol)
        total_ms += t
        total_sol += sol
        total_flop += gflop
        print(f'{name:<22}{f"{h}x{w_}x{ci}":>15}{gflop:>8.1f}{gbio:>7.2f}'
              f'{t:>8.2f}{mxu_sol:>8.2f}{hbm_sol:>8.2f}{t / sol:>7.1f}')

    print(f'# sum of isolated layers: {total_ms:.1f} ms, sum of SOLs '
          f'{total_sol:.1f} ms -> stack is {total_ms / total_sol:.1f}x off '
          f'roofline; {total_flop:.0f} GFLOP = '
          f'{total_flop / total_ms:.1f} TFLOP/s')

    # the FUSED whole-stack program (what the detection program runs):
    # XLA owns the inter-layer layouts here, so this is the number that
    # matters; the isolated rows above localize where its time goes
    ws, cin = [], 5
    for name, kind, karg, _ in layers:
        if kind == 'pool':
            ws.append(None)
            continue
        k, cout, s = karg
        ws.append((jnp.asarray(rng.normal(0, .1, (k, k, cin, cout)), dtype),
                   jnp.asarray(rng.normal(0, 1, cout), dtype),
                   jnp.asarray(1 + rng.random(cout), dtype)))
        cin = cout

    @jax.jit
    def full(x, ws):
        for (name, kind, karg, _), wbs in zip(layers, ws):
            if kind == 'pool':
                x = nn.max_pool(x, (2, 2), (2, 2))
                continue
            w, b, sc = wbs
            x = jax.lax.conv_general_dilated(
                x, w, (karg[2], karg[2]), [(1, 1), (1, 1)],
                dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
            x = nn.leaky_relu(x * sc + b, negative_slope=0.1)
        return x

    x0 = jnp.asarray(rng.random((N, 512, 512, 5), np.float32), dtype)
    t_full = timeit(full, x0, ws) * 1e3
    print(f'# fused full stack: {t_full:.1f} ms = '
          f'{total_flop / t_full:.1f} TFLOP/s '
          f'({total_flop * 1e9 / (t_full * 1e-3) / peak * 100:.0f}% MFU), '
          f'{t_full / total_sol:.1f}x off the {total_sol:.1f} ms roofline')


if __name__ == '__main__':
    main()
