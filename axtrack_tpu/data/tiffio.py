"""Multi-page grayscale TIFF IO.

The reference reads timelapses with ``tifffile.imread`` +
``skimage.img_as_float32`` (Timelapse.py:205-207). tifffile/skimage are not
available here, so this module implements the needed subset with PIL
(multi-page 8/16/32-bit grayscale), normalizing integer data to float32 in
[0, 1] exactly as img_as_float32 does.
"""
import numpy as np
from PIL import Image, ImageSequence

Image.MAX_IMAGE_PIXELS = None  # microscopy frames are large; trust local files


def img_as_float32(arr):
    """skimage.util.img_as_float32 semantics for the dtypes we encounter."""
    if arr.dtype == np.uint8:
        return (arr / np.float32(255.0)).astype(np.float32)
    if arr.dtype == np.uint16:
        return (arr / np.float32(65535.0)).astype(np.float32)
    if arr.dtype in (np.int16, np.int32):
        info = np.iinfo(arr.dtype)
        return (arr / np.float32(info.max)).astype(np.float32)
    return arr.astype(np.float32)


def read_tiff_raw(path):
    """Read a multi-page grayscale TIFF in its NATIVE dtype [T, H, W].

    uint16 microscopy data stays uint16 — the beyond-HBM staged training
    path (data/timelapse.py big-movie mode) keeps the raw integers on host
    and normalizes on device, halving host RAM and making host->device
    transfers compressible.
    """
    img = Image.open(path)
    frames = []
    for page in ImageSequence.Iterator(img):
        a = np.asarray(page)
        if a.ndim == 3:      # RGB(A) page: take first channel (grayscale data)
            a = a[..., 0]
        frames.append(a)
    return np.stack(frames, 0)


def read_tiff(path):
    """Read a multi-page grayscale TIFF into float32 [T, H, W] in [0, 1]."""
    return img_as_float32(read_tiff_raw(path))


def write_tiff(path, stack):
    """Write [T, H, W] array as multi-page TIFF.

    float inputs in [0, 1] are stored as uint16 (typical microscopy depth);
    integer inputs are stored as-is.
    """
    stack = np.asarray(stack)
    if stack.ndim == 2:
        stack = stack[None]
    if np.issubdtype(stack.dtype, np.floating):
        stack = np.clip(stack, 0.0, 1.0)
        stack = (stack * 65535.0 + 0.5).astype(np.uint16)
    pages = [Image.fromarray(f) for f in stack]
    pages[0].save(path, save_all=True, append_images=pages[1:],
                  compression=None)
