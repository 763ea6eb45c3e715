"""Fused preprocessing ops.

TPU-native replacement for the reference Timelapse CPU chain
(Timelapse.py:205-326): mask -> intensity offset -> clip -> log-adjust ->
standardize. The reference round-trips through scipy-sparse per frame purely
to fit host RAM (Timelapse.py:265-275); on TPU the whole chain is a single
fused elementwise XLA program over dense ``f32[T, H, W]`` on HBM.

Statistics parity note: the reference computes per-frame mean/std over the
*nonzero* pixels only (``frame.data`` of a COO matrix, Timelapse.py:290-291);
``nonzero_stats`` reproduces that exactly on dense arrays.
"""
from functools import partial

import jax
import jax.numpy as jnp


def adjust_log(image, gain=1.0):
    """skimage.exposure.adjust_log for float images: gain * log2(1 + x)
    (used at Timelapse.py:258 with gain=True==1)."""
    return gain * jnp.log2(1.0 + image)


@partial(jax.jit, static_argnames=('log_correct',))
def preprocess_frames(imseq, mask, offset, clip_lowerlim, var_scalar,
                      log_correct=True):
    """Fused per-pixel preprocessing chain.

    Args:
      imseq: f32[T, H, W] raw intensities in [0, 1].
      mask: bool/int[H, W] or [T, H, W] segmentation mask; pixels outside
        are zeroed (Timelapse.py:217).
      offset: scalar intensity offset subtracted then clamped at 0
        (Timelapse.py:219-223); pass 0.0 for none.
      clip_lowerlim: values below this become 0 (Timelapse.py:245-249);
        pass 0.0 for none.
      var_scalar: divisor for standardization (Timelapse.py:312); pass 1.0
        for none.
      log_correct: apply log2(1+x) stretch (Timelapse.py:255-259).

    Returns f32[T, H, W].
    """
    x = imseq
    if mask is not None:
        m = mask.astype(jnp.bool_)
        if m.ndim == 2:
            m = m[None]
        x = jnp.where(m, x, 0.0)
    x = jnp.maximum(x - offset, 0.0)
    x = jnp.where(x < clip_lowerlim, 0.0, x)
    if log_correct:
        x = adjust_log(x)
    return x / var_scalar


@partial(jax.jit, static_argnames=('log_correct',))
def staged_preprocess_u16(u16, offset, clip_lowerlim, var_scalar,
                          log_correct=True):
    """preprocess_frames for RAW uint16 input (beyond-HBM staged mode).

    The host keeps the movie as masked/padded uint16 (data/timelapse.py
    staged mode); this op performs the img_as_float32 normalization
    (u/65535, tiffio.py:19-20) followed by the exact preprocess_frames
    chain on device. offset/clip/var are runtime scalars so one compiled
    program serves every dataset.
    """
    x = u16.astype(jnp.float32) / jnp.float32(65535.0)
    x = jnp.maximum(x - offset, 0.0)
    x = jnp.where(x < clip_lowerlim, 0.0, x)
    if log_correct:
        x = adjust_log(x)
    return x / var_scalar


@jax.jit
def nonzero_stats(frames):
    """Per-frame mean/std/max over nonzero pixels.

    Mirrors the reference's sparse-data statistics (np.mean/np.std/np.max of
    ``coo.data``, Timelapse.py:290-294). std is the population std (ddof=0)
    over nonzero entries. Returns (mean[T], std[T], max[T]).
    """
    nz = frames != 0
    n = jnp.maximum(nz.sum(axis=(1, 2)), 1)
    s = jnp.sum(frames, axis=(1, 2))
    mean = s / n
    var = jnp.sum(jnp.where(nz, (frames - mean[:, None, None]) ** 2, 0.0),
                  axis=(1, 2)) / n
    mx = jnp.max(frames, axis=(1, 2))
    return mean, jnp.sqrt(var), mx


def compute_stnd_scaler(frames, standardize='zscore'):
    """Collapsed (movie-global) standardization scalars from per-frame
    nonzero stats (Timelapse.py:296-300). Returns (var_scalar, mean_scalar)."""
    mean, std, mx = nonzero_stats(frames)
    if standardize == 'zscore':
        return float(jnp.mean(std)), float(jnp.mean(mean))
    elif standardize == '0to1':
        return float(jnp.max(mx)), 0.0
    raise ValueError(f'unknown standardize mode {standardize!r}')


def gaussian_kernel1d(sigma, truncate=4.0):
    radius = int(truncate * float(sigma) + 0.5)
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (x / sigma) ** 2)
    return k / k.sum()


@partial(jax.jit, static_argnames=('sigma',))
def gaussian_blur(frames, sigma=3.0):
    """Separable gaussian blur over [T, H, W] (replaces skimage.filters.
    gaussian used for motion frames, Timelapse.py:340)."""
    k = gaussian_kernel1d(sigma)
    r = (k.shape[0] - 1) // 2
    x = frames[:, None]  # NCHW
    ky = k.reshape(1, 1, -1, 1)
    kx = k.reshape(1, 1, 1, -1)
    x = jax.lax.conv_general_dilated(x, ky, (1, 1), [(r, r), (0, 0)])
    x = jax.lax.conv_general_dilated(x, kx, (1, 1), [(0, 0), (r, r)])
    return x[:, 0]


@partial(jax.jit, static_argnames=('sigma', 'lowerlim'))
def motion_frames(frames, sigma=3.0, lowerlim=0.1):
    """Temporal difference motion channels (deprecated in the reference but
    kept for capability parity, Timelapse.py:328-368).

    Returns (pos_motion[T, H, W], neg_motion[T, H, W]); frame 0 is zeros.
    """
    diff = frames[1:] - frames[:-1]
    diff = gaussian_blur(diff, sigma)
    diff = jnp.where(jnp.abs(diff) < lowerlim, 0.0, diff)
    zero = jnp.zeros_like(frames[:1])
    pos = jnp.concatenate([zero, jnp.maximum(diff, 0.0)], 0)
    neg = jnp.concatenate([zero, jnp.maximum(-diff, 0.0)], 0)
    return pos, neg
