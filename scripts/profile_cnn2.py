"""Conv-stack variant shootout (VERDICT r2 item 2).

profile_cnn.py showed the fused deployed stack at ~6.3 TFLOP/s f32 and
bf16-insensitive -> not compute-bound but LAYOUT-bound: with Cout on the
128-lane axis, the early layers (Cout 20/40) waste >80% of every MXU
pass. This script measures alternatives for the early layers:

- im2col patches + dot_general with SPATIAL on the lane axis
  ([Cout, k*k*Cin] x [k*k*Cin, N*H'*W']) — lanes always full.
- space-to-depth on the input (the documented idea).

Run: python scripts/profile_cnn2.py [N_TILES]
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

CONV = get_default_parameters()['ARCHITECTURE'][0]


def timeit(fn, *args, reps=5):
    fn(*args)
    out = fn(*args)
    np.asarray(out.ravel()[:1])
    best = 1e9
    for _ in range(reps):
        t0 = time.time()
        out = fn(*args)
        np.asarray(out.ravel()[:1])
        best = min(best, time.time() - t0)
    return best, out


def make_weights(rng, spec=CONV, cin=5):
    ws = []
    for layer in spec:
        if layer == 'M':
            ws.append(None)
            continue
        k, out_c, s, g = layer
        ws.append(jnp.asarray(rng.normal(0, 0.1, (k, k, cin // g, out_c))
                              .astype(np.float32)))
        cin = out_c
    return ws


def conv_ref(x, w, s):
    return jax.lax.conv_general_dilated(
        x, w, (s, s), [(1, 1), (1, 1)],
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))


def conv_im2col(x, w, s):
    """conv as patches + dot with SPATIAL on the minor (lane) axis."""
    N, H, W, Cin = x.shape
    k = w.shape[0]
    Cout = w.shape[3]
    patches = jax.lax.conv_general_dilated_patches(
        jnp.moveaxis(x, -1, 1), (k, k), (s, s), [(1, 1), (1, 1)])
    # [N, Cin*k*k, H', W']
    _, KK, Ho, Wo = patches.shape
    p = patches.reshape(N, KK, Ho * Wo)
    # weights to [Cout, Cin*k*k] matching patches' Cin-major k-order
    wm = jnp.transpose(w, (3, 2, 0, 1)).reshape(Cout, KK)
    out = jnp.einsum('ok,nks->nos', wm, p)          # [N, Cout, H'*W']
    return jnp.moveaxis(out.reshape(N, Cout, Ho, Wo), 1, -1)


def stack(x, ws, impl_first3):
    """Full conv stack; first 3 convs via impl_first3, rest via conv_ref."""
    conv_i = 0
    for layer, w in zip(CONV, ws):
        if layer == 'M':
            x = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                      (1, 2, 2, 1), (1, 2, 2, 1), 'VALID')
            continue
        k, out_c, s, g = layer
        impl = impl_first3 if conv_i < 3 else conv_ref
        x = impl(x, w, s)
        conv_i += 1
    return x


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 78
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (N, 512, 512, 5)).astype(np.float32))
    ws = make_weights(rng)
    total_fl = 197.8e9 / 78 * N

    f_ref = jax.jit(lambda a: stack(a, ws, conv_ref))
    dt, out_ref = timeit(f_ref, x)
    print(f'reference convs:    {dt*1e3:7.1f} ms  '
          f'{total_fl/dt/1e12:5.2f} TFLOP/s')

    f_im = jax.jit(lambda a: stack(a, ws, conv_im2col))
    dt2, out_im = timeit(f_im, x)
    print(f'im2col first 3:     {dt2*1e3:7.1f} ms  '
          f'{total_fl/dt2/1e12:5.2f} TFLOP/s')
    err = float(jnp.max(jnp.abs(out_ref - out_im)))
    print(f'  max abs diff vs reference convs: {err:.2e}')

    # how much is the first conv alone?
    f1 = jax.jit(lambda a: conv_ref(a, ws[0], 2))
    g1 = jax.jit(lambda a: conv_im2col(a, ws[0], 2))
    d1, _ = timeit(f1, x)
    d2, _ = timeit(g1, x)
    print(f'L0 alone: ref {d1*1e3:.1f} ms | im2col {d2*1e3:.1f} ms')




def conv_s2d_l0(x, w, s):
    """L0 (k=3, s=2, pad 1) via space-to-depth: x [N,H,W,C] ->
    z [N,H/2,W/2,4C], conv k=2 s=1 pad ((1,0),(1,0)) with the kernel
    exactly rearranged (u = 2*ky+dy-1; u=-1 entries are zero). Bit-exact
    weight transform, fills the MXU contraction dim 4x better."""
    assert s == 2 and w.shape[0] == 3
    N, H, W, C = x.shape
    k_out = w.shape[3]
    z = x.reshape(N, H // 2, 2, W // 2, 2, C)
    z = jnp.moveaxis(z, (2, 4), (3, 4)).reshape(N, H // 2, W // 2, 4 * C)
    w2 = np.zeros((2, 2, 2, 2, C, k_out), np.float32)   # ky kx dy dx c o
    wn = np.asarray(w)
    for ky in range(2):
        for kx in range(2):
            for dy in range(2):
                for dx in range(2):
                    u, v = 2 * ky + dy - 1, 2 * kx + dx - 1
                    if 0 <= u < 3 and 0 <= v < 3:
                        w2[ky, kx, dy, dx] = wn[u, v]
    w2 = jnp.asarray(w2.reshape(2, 2, 4 * C, k_out))
    return jax.lax.conv_general_dilated(
        z, w2, (1, 1), [(1, 0), (1, 0)],
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))


def main_s2d():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 78
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (N, 512, 512, 5)).astype(np.float32))
    ws = make_weights(rng)
    total_fl = 197.8e9 / 78 * N

    def impl_l0_only(fn):
        calls = [0]

        def impl(a, w, s):
            calls[0] += 1
            return fn(a, w, s) if calls[0] == 1 else conv_ref(a, w, s)
        return impl

    f_ref = jax.jit(lambda a: stack(a, ws, conv_ref))
    dt, out_ref = timeit(f_ref, x)
    print(f'reference convs:    {dt*1e3:7.1f} ms  '
          f'{total_fl/dt/1e12:5.2f} TFLOP/s')

    f_s2d = jax.jit(lambda a: stack(a, ws, impl_l0_only(conv_s2d_l0)))
    dt2, out_s2d = timeit(f_s2d, x)
    print(f's2d L0:             {dt2*1e3:7.1f} ms  '
          f'{total_fl/dt2/1e12:5.2f} TFLOP/s')
    err = float(jnp.max(jnp.abs(out_ref - out_s2d)))
    print(f'  max abs diff vs reference convs: {err:.2e}')


if os.environ.get('S2D'):
    main_s2d()
    sys.exit(0)



if __name__ == '__main__' and not os.environ.get('S2D'):
    main()