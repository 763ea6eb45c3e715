"""Per-layer conv-stack profiling on the real chip (VERDICT r2 item 2).

The detect stage is ~87% of the e2e bench budget and the conv stack runs
at ~9% f32 MFU (BASELINE.md): thin channels (5/20/40/80) waste MXU lanes.
This script times each layer of the deployed ARCHITECTURE separately and
the whole stack, to target the right layer before optimizing.

Run: python scripts/profile_cnn.py [N_TILES]
"""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')

from axtrack_tpu.params import get_default_parameters  # noqa: E402


def timeit(fn, *args, reps=5):
    fn(*args)                       # compile
    out = fn(*args)
    np.asarray(out.ravel()[:1])     # force through the tunnel
    best = 1e9
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        np.asarray(out.ravel()[:1])
        best = min(best, time.time() - t0)
    return best, out


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 78
    P = get_default_parameters()
    conv_spec = P['ARCHITECTURE'][0]
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (N, 512, 512, 5)).astype(np.float32))

    total_fl = 0.0
    print(f'{N} tiles, f32, NHWC, per-layer (jit each):')
    cur = x
    layer_times = []
    for li, layer in enumerate(conv_spec):
        if layer == 'M':
            f = jax.jit(lambda a: jax.lax.reduce_window(
                a, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1),
                'VALID'))
            dt, cur = timeit(f, cur)
            print(f'  L{li} maxpool {cur.shape}: {dt*1e3:7.1f} ms')
            layer_times.append(dt)
            continue
        k, out_c, s, g = layer
        cin = cur.shape[-1]
        w = jnp.asarray(rng.normal(0, 0.1, (k, k, cin // g, out_c))
                        .astype(np.float32))

        def conv(a, w=w, s=s, g=g):
            return jax.lax.conv_general_dilated(
                a, w, (s, s), [(1, 1), (1, 1)],
                dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
                feature_group_count=g)
        f = jax.jit(conv)
        dt, cur = timeit(f, cur)
        flops = (np.prod(cur.shape) * k * k * cin / g * 2)
        total_fl += flops
        layer_times.append(dt)
        print(f'  L{li} conv{k}x{k} s{s} {cin:3}->{out_c:3} '
              f'out{tuple(cur.shape)}: {dt*1e3:7.1f} ms  '
              f'{flops/dt/1e12:6.2f} TFLOP/s')
    print(f'  sum of layers: {sum(layer_times)*1e3:.1f} ms '
          f'({total_fl/1e9:.1f} GFLOP total)')

    # whole stack in one jit (XLA fuses BN/act into convs in the real
    # model; here convs only to isolate MXU behavior)
    ws = []
    cin = 5
    for layer in conv_spec:
        if layer == 'M':
            ws.append(None)
            continue
        k, out_c, s, g = layer
        ws.append(jnp.asarray(
            rng.normal(0, 0.1, (k, k, cin // g, out_c)).astype(np.float32)))
        cin = out_c

    @jax.jit
    def stack(a):
        c = a
        for layer, w in zip(conv_spec, ws):
            if layer == 'M':
                c = jax.lax.reduce_window(c, -jnp.inf, jax.lax.max,
                                          (1, 2, 2, 1), (1, 2, 2, 1),
                                          'VALID')
            else:
                k, out_c, s, g = layer
                c = jax.lax.conv_general_dilated(
                    c, w, (s, s), [(1, 1), (1, 1)],
                    dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
                    feature_group_count=g)
        return c

    dt, _ = timeit(stack, x)
    print(f'  fused stack: {dt*1e3:.1f} ms  '
          f'{total_fl/dt/1e12:.2f} TFLOP/s')

    # bf16 variant
    @jax.jit
    def stack_bf16(a):
        c = a.astype(jnp.bfloat16)
        for layer, w in zip(conv_spec, ws):
            if layer == 'M':
                c = jax.lax.reduce_window(c, jnp.bfloat16(-np.inf),
                                          jax.lax.max, (1, 2, 2, 1),
                                          (1, 2, 2, 1), 'VALID')
            else:
                k, out_c, s, g = layer
                c = jax.lax.conv_general_dilated(
                    c, w.astype(jnp.bfloat16), (s, s), [(1, 1), (1, 1)],
                    dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
                    feature_group_count=g)
        return c

    dt, _ = timeit(stack_bf16, x)
    print(f'  fused stack bf16: {dt*1e3:.1f} ms  '
          f'{total_fl/dt/1e12:.2f} TFLOP/s')


if __name__ == '__main__':
    main()
