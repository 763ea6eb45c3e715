"""Per-layer conv-stack cost breakdown + speed-of-light model (r4 next #2).

Times cumulative PREFIXES of the deployed stack (conv layers with
BN+leaky-relu, then pools, then the FC head) on the real chip and
differences them into per-layer costs. Each layer's cost is compared to
its MXU speed-of-light given the lane/sublane layout:

  sol_layer = FLOPs / (peak * lane_util)   with lane_util = Cout/128
              (Cout on the 128-lane minor axis; rows = N*H'*W' are
              abundant at bench batch sizes, contraction = 3*3*Cin)

Prints a table: layer, out shape, GFLOP, measured ms, SOL ms, ratio.
Run on TPU:  python scripts/profile_cnn3.py [N_TILES] [dtype]
"""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')

from axtrack_tpu.params import get_default_parameters  # noqa: E402

P = get_default_parameters()
CONV = P['ARCHITECTURE'][0]


def build_layers(dtype):
    """(name, fn, weight_shapes) per stage, mirroring CNNBlock semantics."""
    layers = []
    cin = 5
    for i, spec in enumerate(CONV):
        if spec == 'M':
            layers.append((f'pool{i}', 'pool', None, None))
            continue
        k, cout, s, g = spec
        layers.append((f'conv{i} {cin}->{cout}' + (f' s{s}' if s > 1 else ''),
                       'conv', (k, k, cin, cout), s))
        cin = cout
    return layers


def timeit(fn, *args, reps=5):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0].ravel()[:1])
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0].ravel()[:1])
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 312
    dtype = {'f32': jnp.float32, 'bf16': jnp.bfloat16}[
        sys.argv[2] if len(sys.argv) > 2 else 'f32']
    peak = {'f32': 49e12, 'bf16': 197e12}[
        sys.argv[2] if len(sys.argv) > 2 else 'f32']
    rng = np.random.default_rng(0)
    layers = build_layers(dtype)

    ws = []
    for name, kind, wshape, s in layers:
        if kind == 'conv':
            ws.append((jnp.asarray(rng.normal(0, 0.1, wshape), dtype),
                       jnp.asarray(rng.normal(0, 1, wshape[-1]), dtype),
                       jnp.asarray(1 + rng.random(wshape[-1]), dtype)))
        else:
            ws.append(None)

    def prefix_fn(n_layers):
        @jax.jit
        def run(x, ws):
            for li in range(n_layers):
                name, kind, wshape, s = layers[li]
                if kind == 'pool':
                    x = nn.max_pool(x, (2, 2), (2, 2))
                    continue
                w, b, scale = ws[li]
                x = jax.lax.conv_general_dilated(
                    x, w, (s, s), [(1, 1), (1, 1)],
                    dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
                x = x * scale + b          # BN(inference) as affine
                x = nn.leaky_relu(x, negative_slope=0.1)
            return x
        return run

    x = jnp.asarray(rng.random((N, 512, 512, 5)), dtype)
    print(f'# N={N} tiles, dtype={jnp.dtype(dtype).name}, '
          f'peak={peak/1e12:.0f} TFLOP/s')
    print(f'{"layer":<22}{"out":>16}{"GFLOP":>9}{"cum ms":>9}{"ms":>8}'
          f'{"SOL ms":>8}{"x SOL":>7}')
    prev_t = 0.0
    H = W = 512
    cin = 5
    total_flop = 0.0
    for li in range(len(layers)):
        name, kind, wshape, s = layers[li]
        t = timeit(prefix_fn(li + 1), x, ws) * 1e3
        if kind == 'pool':
            H //= 2
            W //= 2
            gflop, sol = 0.0, 0.0
        else:
            k, _, ci, cout = wshape
            H //= s
            W //= s
            gflop = 2 * N * H * W * cout * k * k * ci / 1e9
            total_flop += gflop
            lane_util = min(cout, 128) / 128
            sol = gflop * 1e9 / (peak * lane_util) * 1e3
            cin = cout
        dt = t - prev_t
        print(f'{name:<22}{f"{H}x{W}x{cin}":>16}{gflop:>9.1f}{t:>9.1f}'
              f'{dt:>8.1f}{sol:>8.2f}'
              f'{(dt / sol if sol else 0):>7.1f}')
        prev_t = t

    full = prev_t
    print(f'# conv stack total: {total_flop:.0f} GFLOP in {full:.1f} ms '
          f'= {total_flop / full:.1f} TFLOP/s '
          f'({total_flop / full * 1e9 / peak * 100:.0f}% of peak)')


if __name__ == '__main__':
    main()
