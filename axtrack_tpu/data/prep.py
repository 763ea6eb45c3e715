"""Programmatic training-data preparation.

Replaces the reference's four interactive napari notebooks
(`/root/reference/data_prep_nbs/00_segment_bg.ipynb` ..
`03_construct_trainingdata.ipynb`) with plain functions:

  00 segment background   -> :func:`segment_background`
  01 process timelapses   -> :func:`process_timelapse` (+ offset/pad/slice)
  02 merge label CSVs     -> :func:`merge_axon_label_files`
  03 construct train data -> :func:`merge_training_data`,
                             :func:`construct_trainingdata`

Divergence from the reference, documented: notebook 00 segments the
transmission channel by prewitt-edge detection + otsu + binary closing and
then relies on *manual* napari cleanup and a hand-placed flood point
(00_segment_bg.ipynb cells `segment_microchannels` / `flood_initial_mask`).
A fully programmatic pipeline cannot assume manual edits, so
:func:`segment_background` segments by smoothed-intensity Otsu with
morphological closing and small-region removal; an optional ``floodpoint``
keeps only the connected component containing it (the programmatic analog
of the notebook's flood step). skimage is unavailable in this environment;
scipy.ndimage provides the morphology.
"""
import os

import numpy as np
import pandas as pd
from scipy import ndimage

from .tiffio import read_tiff, write_tiff


# ---------------------------------------------------------------- 00: mask

def otsu_threshold(img, nbins=256):
    """Otsu's threshold (skimage.filters.threshold_otsu equivalent)."""
    img = np.asarray(img, dtype=np.float64).ravel()
    counts, edges = np.histogram(img, bins=nbins)
    centers = (edges[:-1] + edges[1:]) / 2.0
    counts = counts.astype(np.float64)
    w0 = np.cumsum(counts)
    w1 = w0[-1] - w0
    m0 = np.cumsum(counts * centers)
    mu0 = np.divide(m0, w0, out=np.zeros_like(m0), where=w0 > 0)
    mu1 = np.divide(m0[-1] - m0, w1, out=np.zeros_like(m0), where=w1 > 0)
    between = w0 * w1 * (mu0 - mu1) ** 2
    return centers[int(np.argmax(between))]


def segment_background(img, gaussian_sigma=1.0, bin_closing_dim=4,
                       min_region_px=1000, floodpoint=None):
    """Segment the microchannel system of a transmission-channel frame.

    Programmatic counterpart of 00_segment_bg.ipynb (see module docstring
    for the documented divergence). Returns a bool [H, W] mask, True inside
    the channels.

    Arguments
    ---------
    img : [H, W] array
        Transmission channel (any float/uint scale).
    gaussian_sigma : float
        Denoising strength before thresholding (notebook: post-edge
        smoothing with the same default).
    bin_closing_dim : int
        Structuring-element size for binary closing (notebook default 4).
    min_region_px : int
        Connected components smaller than this are dropped (programmatic
        replacement for the notebook's manual cleanup).
    floodpoint : (int, int) or None
        If given, keep only the connected component containing this (y, x)
        point — the analog of the notebook's flood-from-point step.
    """
    img = np.asarray(img, dtype=np.float32)
    smoothed = ndimage.gaussian_filter(img, sigma=gaussian_sigma)
    binary = smoothed > otsu_threshold(smoothed)
    if bin_closing_dim and bin_closing_dim > 1:
        structure = np.ones((bin_closing_dim, bin_closing_dim), bool)
        binary = ndimage.binary_closing(binary, structure=structure)
    labels, n = ndimage.label(binary)
    if n == 0:
        return binary
    if floodpoint is not None:
        lab = labels[int(floodpoint[0]), int(floodpoint[1])]
        if lab == 0:
            raise ValueError(f'floodpoint {floodpoint} is not inside any '
                             'segmented region')
        return labels == lab
    sizes = ndimage.sum_labels(np.ones_like(labels), labels,
                               index=np.arange(1, n + 1))
    keep = np.flatnonzero(sizes >= min_region_px) + 1
    return np.isin(labels, keep)


# ---------------------------------------- 01: per-timelapse shape/intensity

def offset_intensity(frames, offset):
    """Subtract a camera offset, clipping at 0 (notebook `offset_intensity`).

    Works on float [0, 1] stacks; ``offset`` is given in uint16 counts as in
    the reference (e.g. 121) and rescaled.
    """
    if not offset:
        return frames
    frames = np.asarray(frames, dtype=np.float32)
    return np.clip(frames - np.float32(offset) / 65535.0, 0.0, None)


def pad_to_shape(frames, mask, to_shape):
    """Center-pad [T, H, W] frames (+ [H, W] mask) to (toH, toW)."""
    toH, toW = to_shape
    H, W = frames.shape[1:]
    padH, padW = (toH - H) // 2, (toW - W) // 2
    frames = np.pad(frames, ((0, 0), (padH, toH - H - padH),
                             (padW, toW - W - padW)))
    if mask is not None:
        mask = np.pad(mask, ((padH, toH - H - padH), (padW, toW - W - padW)))
    return frames, mask


def process_timelapse(frames, mask=None, timeslice=None, to_shape=None,
                      H_slice=None, W_slice=None, second_mask=None,
                      offset=0):
    """One timelapse through the notebook-01 chain.

    Order matches `process_timelapses` in the reference notebook: temporal
    slice -> intensity offset -> (second) masking -> pad -> H/W crop.
    Returns (frames [T, H, W] float32, mask [H, W] bool or None).
    """
    frames = np.asarray(frames, dtype=np.float32)
    if timeslice is not None:
        frames = frames[timeslice[0]:timeslice[1]]
    frames = offset_intensity(frames, offset)
    if second_mask is not None:
        frames = frames * second_mask.astype(np.float32)[None]
    if to_shape is not None:
        frames, mask = pad_to_shape(frames, mask, to_shape)
    if H_slice is not None:
        frames = frames[:, H_slice[0]:H_slice[1]]
        if mask is not None:
            mask = mask[H_slice[0]:H_slice[1]]
    if W_slice is not None:
        frames = frames[:, :, W_slice[0]:W_slice[1]]
        if mask is not None:
            mask = mask[:, W_slice[0]:W_slice[1]]
    return frames, mask


# --------------------------------------------------------- 02: label merge

def merge_axon_label_files(csv_paths):
    """Concatenate per-labeller CSV files for one timelapse column-wise.

    Reference `merge_axonID_files` (02_label_training_timelapses.ipynb):
    each CSV has a (Axon_xxx, anchor) MultiIndex header and frame-index
    rows.
    """
    dfs = [pd.read_csv(p, header=[0, 1], index_col=0) for p in csv_paths]
    return pd.concat(dfs, axis=1)


def _renumber_axon_columns(lbl, id_offset):
    """Shift Axon_### column IDs by id_offset (reference notebook 03)."""
    cols = []
    for ax, anch in lbl.columns:
        digits = ''.join(ch for ch in str(ax) if ch.isdigit())
        n = int(digits) if digits else 0
        cols.append((f'Axon_{n + id_offset:0>3}', anch))
    out = lbl.copy()
    out.columns = pd.MultiIndex.from_tuples(cols)
    return out


# ------------------------------------------------------- 03: merge + write

def merge_training_data(signals, masks, lbls):
    """Merge labelled timelapses along time (reference
    `merge_all_training_data`, 03_construct_trainingdata.ipynb).

    Frame indices of later movies are shifted by the cumulative frame
    count, axon IDs by the cumulative ID count; masks are broadcast to one
    [H, W] slice per frame. Returns (signal [T, H, W] float32,
    mask [T, H, W] bool, labels DataFrame [T, nIDs*2]).
    """
    last_t, last_id = 0, 0
    adj_lbls, mask_frames = [], []
    for sig, mask, lbl in zip(signals, masks, lbls):
        T = sig.shape[0]
        lbl = _renumber_axon_columns(lbl, last_id)
        lbl.index = lbl.index + last_t
        adj_lbls.append(lbl)
        m = np.ones(sig.shape[1:], bool) if mask is None else mask.astype(bool)
        mask_frames.extend([m] * T)
        last_t += T
        # advance by max renumbered ID + 1, not the unique-column COUNT:
        # per-labeller merges (merge_axon_label_files) leave ID ranges
        # non-contiguous (e.g. 0-30 and 100-130), and a count-based offset
        # would let a later movie's renumbered IDs collide with this one's
        # and pd.concat would fuse two different axons into one column
        ids = [int(''.join(ch for ch in str(ax) if ch.isdigit()) or 0)
               for ax in lbl.columns.unique(0)]
        last_id = (max(ids) + 1) if ids else last_id
    signal = np.concatenate([np.asarray(s, np.float32) for s in signals], 0)
    mask = np.stack(mask_frames, 0)
    labels = pd.concat(adj_lbls)
    return signal, mask, labels


def construct_trainingdata(tif_paths, mask_paths, label_paths, out_dir,
                           prefix='training'):
    """Load, merge, and write the unified training bundle.

    Programmatic end-to-end of notebook 03: reads each movie's tif / mask
    (.npy) / labels CSV, merges via :func:`merge_training_data`, and writes
    ``{prefix}_timelapse.tif`` / ``{prefix}_mask.npy`` /
    ``{prefix}_labels.csv`` into ``out_dir``. ``label_paths`` entries may be
    a single CSV path or a list of per-labeller CSVs (merged column-wise
    first). Returns the written paths as a dict.
    """
    os.makedirs(out_dir, exist_ok=True)
    signals, masks, lbls = [], [], []
    for tif, mask, lab in zip(tif_paths, mask_paths, label_paths):
        signals.append(read_tiff(tif))
        masks.append(None if mask is None else np.load(mask))
        if isinstance(lab, (list, tuple)):
            lbls.append(merge_axon_label_files(lab))
        else:
            lbls.append(pd.read_csv(lab, header=[0, 1], index_col=0))
    signal, mask, labels = merge_training_data(signals, masks, lbls)

    tif_out = os.path.join(out_dir, f'{prefix}_timelapse.tif')
    mask_out = os.path.join(out_dir, f'{prefix}_mask.npy')
    labels_out = os.path.join(out_dir, f'{prefix}_labels.csv')
    write_tiff(tif_out, signal)
    np.save(mask_out, mask)
    labels.to_csv(labels_out)
    return {'tif': tif_out, 'mask': mask_out, 'labels': labels_out}
