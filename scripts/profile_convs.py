"""Per-layer timing of the detector conv stack on the real TPU.

The axon tunnel adds a ~50ms fixed dispatch overhead per jitted call, so
isolated per-layer timings are useless. Instead we time jitted PREFIXES of
the network (layers 0..i) and report consecutive differences: the fixed
overhead cancels. Scratch profiling tool for kernel work; not a test.
"""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time
import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from axtrack_tpu.params import get_default_parameters
from axtrack_tpu.models.yolo import build_model, init_variables, detect_axons

P = get_default_parameters()
BATCH = int(os.environ.get('B', 260))   # ~4 frames x 65 tiles
DTYPE = {'bf16': jnp.bfloat16}.get(os.environ.get('DT', ''), jnp.float32)


def timeit(fn, *args, n=5):
    out = fn(*args)
    jax.block_until_ready(out)
    np.asarray(out.ravel()[0])
    best = np.inf
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        np.asarray(out.ravel()[0])
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    model = build_model(P, dtype=DTYPE)
    variables = init_variables(model, P, seed=0)
    rng = jax.random.PRNGKey(0)
    x = jax.device_put(jax.random.normal(rng, (BATCH, 512, 512, 5), jnp.float32))

    conv_spec, fc_spec = P['ARCHITECTURE']
    names = []
    for layer in conv_spec:
        names.append('maxpool' if layer == 'M' else f'conv{layer[0]}x{layer[0]}s{layer[2]}->{layer[1]}')
    names += [f'{t}:{p}' for t, p in fc_spec] + ['head']

    # build prefix functions by truncating the applied module list via a
    # custom apply that stops after k layers
    from axtrack_tpu.models.yolo import CNNBlock, make_activation

    def make_prefix(k):
        def fwd(vs, a):
            params, bstats = vs['params'], vs['batch_stats']
            cur = a.astype(DTYPE)
            ci = 0   # CNNBlock index
            di = 0   # Dense index
            step = 0
            for layer in conv_spec:
                if step >= k:
                    return cur.astype(jnp.float32)
                if layer == 'M':
                    cur = nn.max_pool(cur, (2, 2), strides=(2, 2))
                else:
                    kk, out_c, stride, groups = layer
                    blk = CNNBlock(out_c, kk, stride, groups,
                                   P['ACTIVATION_FUNCTION'], dtype=DTYPE)
                    name = f'CNNBlock_{ci}'
                    cur = blk.apply({'params': params[name],
                                     'batch_stats': bstats[name]}, cur,
                                    train=False)
                    ci += 1
                step += 1
            cur = cur.reshape(cur.shape[0], -1).astype(jnp.float32)
            for element_type, param in fc_spec:
                if step >= k:
                    return cur.astype(jnp.float32)
                if element_type == 'FC':
                    dn = nn.Dense(param, dtype=DTYPE, param_dtype=jnp.float32)
                    cur = dn.apply({'params': params[f'Dense_{di}']}, cur)
                    cur = cur.astype(jnp.float32)
                    di += 1
                elif element_type == 'activation':
                    cur = make_activation(param)(cur)
                step += 1
            if step >= k:
                return cur.astype(jnp.float32)
            dn = nn.Dense(model.Sy * model.Sx * 3, param_dtype=jnp.float32)
            cur = dn.apply({'params': params[f'Dense_{di}']}, cur)
            return cur.astype(jnp.float32)
        return jax.jit(fwd)

    n_steps = len(conv_spec) + len(fc_spec) + 1
    prev = 0.0
    print(f'batch {BATCH}, dtype {DTYPE.__name__}')
    for k in range(1, n_steps + 1):
        dt = timeit(make_prefix(k), variables, x)
        print(f'after step {k:2d} ({names[k-1]:24s}): cum {dt*1e3:8.2f} ms   '
              f'delta {(dt-prev)*1e3:8.2f} ms')
        prev = dt

    fn = jax.jit(lambda v, a: detect_axons(model, v, a))
    dt = timeit(fn, variables, x)
    print(f'full model: {dt*1e3:.1f} ms for batch {BATCH} '
          f'({dt/BATCH*78*1e3:.1f} ms/frame at 78 tiles)')


if __name__ == '__main__':
    main()
