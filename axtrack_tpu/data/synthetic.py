"""Synthetic timelapse fixtures.

The reference's bundled example data (examples/example_timelapse.tif,
deployed_model/E1000.pth) is LFS-stripped in this snapshot
(.MISSING_LARGE_BLOBS), so behavioral parity is defined against synthetic
fixtures: microchannel-style masks with bright growth-cone blobs moving
along the channels, written in the reference's on-disk formats (multi-page
uint16 .tif, bool .npy mask, (axon, anchor) multi-index labels CSV —
data_prep_nbs/ outputs, SURVEY.md §2 row 18).
"""
import os

import numpy as np
import pandas as pd

from .tiffio import write_tiff


def make_channel_mask(H, W, n_channels=3, channel_height=40, rng=None):
    """Horizontal microchannels joined by one seeding corridor on the left."""
    rng = rng or np.random.default_rng(0)
    mask = np.zeros((H, W), bool)
    gap = H // (n_channels + 1)
    centers = []
    for c in range(n_channels):
        y0 = gap * (c + 1) - channel_height // 2
        mask[max(y0, 0):min(y0 + channel_height, H), :] = True
        centers.append(y0 + channel_height // 2)
    # seeding corridor connecting channels
    mask[min(centers) - channel_height // 2:
         max(centers) + channel_height // 2, :channel_height * 2] = True
    return mask, centers


def make_synthetic_timelapse(T=20, H=512, W=1024, n_axons=8, seed=0,
                             speed=(4, 14), blob_sigma=3.5, amplitude=0.35,
                             noise=0.004, background=0.008, n_channels=3):
    """Generate (frames f32[T,H,W] in [0,1], mask bool[H,W], labels
    DataFrame rows=frames, columns=(Axon_xxx, {anchor_y, anchor_x})).

    Growth cones travel rightward along channels at constant-ish speed with
    jitter — mirroring the reference's biology (axons growing through
    microchannels, README.md:1-2).
    """
    rng = np.random.default_rng(seed)
    mask, centers = make_channel_mask(H, W, n_channels=n_channels, rng=rng)
    frames = rng.normal(background, noise, (T, H, W)).astype(np.float32)
    frames = np.clip(frames, 0, 1)

    tracks = {}
    for a in range(n_axons):
        c = centers[a % len(centers)]
        lo = min(60, W * 0.1)
        x0 = float(rng.uniform(lo, max(W * 0.35, lo + 1)))
        y0 = float(c + rng.uniform(-8, 8))
        v = float(rng.uniform(*speed))
        xs, ys = [], []
        x, y = x0, y0
        for t in range(T):
            xs.append(x)
            ys.append(y)
            x = min(x + v + rng.normal(0, 1.0), W - 8.0)
            y = np.clip(y + rng.normal(0, 0.8), c - 12, c + 12)
        tracks[f'Axon_{a:0>3}'] = (np.array(ys), np.array(xs))

    yy, xx = np.mgrid[0:H, 0:W]
    for name, (ys, xs) in tracks.items():
        for t in range(T):
            cy, cx = ys[t], xs[t]
            r = int(4 * blob_sigma)
            y1, y2 = max(int(cy) - r, 0), min(int(cy) + r + 1, H)
            x1, x2 = max(int(cx) - r, 0), min(int(cx) + r + 1, W)
            g = np.exp(-(((yy[y1:y2, x1:x2] - cy) ** 2
                          + (xx[y1:y2, x1:x2] - cx) ** 2)
                         / (2 * blob_sigma ** 2)))
            frames[t, y1:y2, x1:x2] += amplitude * g.astype(np.float32)
    frames[:, ~mask] = 0.0
    frames = np.clip(frames, 0.0, 1.0)

    cols = pd.MultiIndex.from_product(
        [sorted(tracks), ['anchor_y', 'anchor_x']], names=('axon', 'prop'))
    labels = pd.DataFrame(index=range(T), columns=cols, dtype=float)
    for name, (ys, xs) in tracks.items():
        labels[(name, 'anchor_y')] = np.round(ys)
        labels[(name, 'anchor_x')] = np.round(xs)
    return frames, mask, labels


def write_fixture(directory, name='synthetic_timelapse', **kwargs):
    """Write .tif / _mask.npy / _labels.csv fixture files; returns paths."""
    os.makedirs(directory, exist_ok=True)
    frames, mask, labels = make_synthetic_timelapse(**kwargs)
    tif = os.path.join(directory, f'{name}.tif')
    npy = os.path.join(directory, f'{name}_mask.npy')
    csv = os.path.join(directory, f'{name}_labels.csv')
    write_tiff(tif, frames)
    np.save(npy, mask)
    labels.to_csv(csv)
    return {'tif': tif, 'mask': npy, 'labels': csv,
            'frames': frames, 'mask_arr': mask, 'labels_df': labels}


def ensure_example_fixture(examples_dir, H=2920, W=6364, T=20, n_axons=30,
                           seed=7, n_channels=12, force=False):
    """(Re)generate the bundled example movie if absent.

    The example inputs (~740 MB at the reference IMG_DIM) are deterministic
    seeded draws, so they are regenerated on demand rather than committed;
    the committed example render (examples/axon_dets/) was produced from
    exactly this draw. Geometry mirrors the reference's bundled 20-frame
    example at its full 2920x6364 frame size (examples/test.py:16-20 —
    LFS-stripped in the snapshot; IMG_DIM exp_parameters.py:59). Returns
    the tif path.
    """
    tif = os.path.join(examples_dir, 'example_timelapse.tif')
    mask = os.path.join(examples_dir, 'example_timelapse_mask.npy')
    if not force and os.path.exists(tif) and os.path.exists(mask):
        return tif
    fx = write_fixture(examples_dir, name='example_timelapse', T=T, H=H,
                       W=W, n_axons=n_axons, seed=seed,
                       n_channels=n_channels)
    # the example flow treats the movie as unlabeled input; keep the truth
    # aside under a name the pipeline does not pick up
    os.replace(fx['labels'], os.path.join(
        examples_dir, 'example_timelapse_true_labels.csv'))
    return tif


class OracleDetector:
    """Callable detector producing near-ground-truth YOLO grids — decouples
    pipeline tests (decode/NMS/tracking) from detector training quality.

    conf of true cells = ``conf``; optionally adds distractor cells.
    """

    def __init__(self, dataset, conf=0.95, noise_cells=0, noise_conf=0.6,
                 seed=0):
        self.dataset = dataset
        self.conf = conf
        self.noise_cells = noise_cells
        self.noise_conf = noise_conf
        self.rng = np.random.default_rng(seed)

    def __call__(self, t, X):
        import jax.numpy as jnp
        t_all = self.dataset.timepoints_indices[t]
        grid = np.asarray(self.dataset.target_tiled[t_all]).copy()
        grid = grid[..., :3]
        grid[..., 0] *= self.conf
        for _ in range(self.noise_cells):
            k = self.rng.integers(0, grid.shape[0])
            gx = self.rng.integers(0, grid.shape[1])
            gy = self.rng.integers(0, grid.shape[2])
            if grid[k, gx, gy, 0] == 0:
                grid[k, gx, gy] = (self.noise_conf, self.rng.random(),
                                   self.rng.random())
        return jnp.asarray(grid)
