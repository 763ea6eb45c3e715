"""Detection rendering — frames and videos.

Counterpart of reference axtrack/video_plotting.py:17-329 (draw_all /
setup_frame_drawing / draw_frame / draw_detections). Behavior preserved:
per-axon hsv colors by ID, dashed detection boxes + labels, optional
ground-truth boxes, tile-grid lines, scalebar, DIV age label, description
text, mask-brightened background, t/y/x slicing. Output: per-frame PNGs and
an animated .mp4 (ffmpeg) or .gif (PIL fallback — this image has no ffmpeg).
"""
import os

import numpy as np
import matplotlib
import matplotlib.pyplot as plt
from matplotlib.patches import Rectangle

from .. import config


def _axon_color(axon_id_str):
    idx = int(str(axon_id_str)[-3:])
    return matplotlib.colormaps['hsv'](((idx * 37) % 100) / 100)


def _slice_or(sl, default):
    return sl if sl is not None else default


def _paths_overlay(shape_yx, axon_paths, trg_paths, y0, x0,
                   axon_subset=None):
    """RGBA canvas with geodesic path pixels painted per-axon (hsv color),
    target paths light gray, then dilated + blurred — the reference's
    paths_canvas treatment (video_plotting.py:301-329: paint -> 6px
    dilation -> gaussian(1) -> alpha from channel max)."""
    from scipy import ndimage
    H, W = shape_yx
    canvas = np.zeros((H, W, 3), np.float32)
    for name, segs in (axon_paths or {}).items():
        if axon_subset is not None and name not in axon_subset:
            continue
        col = np.asarray(_axon_color(name)[:3], np.float32)
        for ys, xs in segs:
            yy, xx = np.asarray(ys) - y0, np.asarray(xs) - x0
            ok = (yy >= 0) & (yy < H) & (xx >= 0) & (xx < W)
            canvas[yy[ok], xx[ok]] = col
    for name, (ys, xs) in (trg_paths or {}).items():
        yy, xx = np.asarray(ys) - y0, np.asarray(xs) - x0
        ok = (yy >= 0) & (yy < H) & (xx >= 0) & (xx < W)
        canvas[yy[ok], xx[ok]] = (.85, .85, .85)
    if not canvas.any():
        return None
    canvas = ndimage.maximum_filter(canvas, size=(6, 6, 1))
    canvas = ndimage.gaussian_filter(canvas, sigma=(1, 1, 0))
    alpha = np.clip(canvas.max(-1), 0, 1)
    return np.concatenate([np.clip(canvas, 0, 1), alpha[..., None]], -1)


def geodesic_path_pixels(mask, p_from_xy, p_to_xy, max_path_length=10000):
    """(ys, xs) of the geodesic path between two detections on the
    segmentation mask (native A*; the reference fans this out with
    pyastar2d threads for its reconstruction canvases)."""
    from .. import native
    if mask is None:
        return None
    wts = np.where(np.asarray(mask, bool), 1.0, 2.0 ** 16).astype(np.float32)
    coo = native.astar_path(
        wts, (int(p_from_xy[1]), int(p_from_xy[0])),
        (int(p_to_xy[1]), int(p_to_xy[0])), max_path_length)
    if coo is None:
        return None
    return coo[:, 0], coo[:, 1]


def draw_frame(img, dets, true_dets, axon_dets, t, ax, description='',
               dets_kwargs=None, scnd_dets_kwargs=None, draw_grid=True,
               draw_scalebar=False, draw_brightened_bg=False,
               y_slice=None, x_slice=None, axon_subset=None, trails=None,
               axon_paths=None, trg_paths=None):
    dets_kwargs = dets_kwargs or dict(config.PREDICTED_BOXES_KWARGS)
    scnd_dets_kwargs = scnd_dets_kwargs or dict(config.GROUNDTRUTH_BOXES_KWARGS)
    ds = axon_dets.dataset
    y0, y1 = _slice_or(y_slice, (0, img.shape[0]))
    x0, x1 = _slice_or(x_slice, (0, img.shape[1]))
    im = np.asarray(img[y0:y1, x0:x1], np.float32)

    if draw_brightened_bg and ds.mask is not None:
        m = np.asarray(ds.mask, bool)[y0:y1, x0:x1]
        im = im + 0.15 * m * max(float(im.max()), 1e-6)
    vmax = np.percentile(im[im > 0], 99.5) if (im > 0).any() else 1.0
    ax.imshow(im, cmap='gray', vmin=0, vmax=max(vmax, 1e-6))

    bs = axon_dets.axon_box_size
    for det_set, kwargs, is_pred in ((dets, dets_kwargs, True),
                                     (true_dets, scnd_dets_kwargs, False)):
        if det_set is None:
            continue
        for name, row in det_set.iterrows():
            if axon_subset is not None and name not in axon_subset:
                continue
            x, y = float(row['anchor_x']) - x0, float(row['anchor_y']) - y0
            if not (0 <= x < x1 - x0 and 0 <= y < y1 - y0):
                continue
            kw = dict(kwargs)
            if kw.get('edgecolor') == 'hsv':
                kw['edgecolor'] = _axon_color(name)
            ax.add_patch(Rectangle((x - bs / 2, y - bs / 2), bs, bs, **kw))
            if is_pred:
                ax.text(x - bs / 2, y - bs / 2 - 4, str(name).lstrip('Axon_'),
                        color=kw['edgecolor'], fontsize=5)

    if axon_paths or trg_paths:
        overlay = _paths_overlay((y1 - y0, x1 - x0), axon_paths, trg_paths,
                                 y0, x0, axon_subset)
        if overlay is not None:
            ax.imshow(overlay)

    if trails:
        # identity trails: each ID's tracked positions up to frame t
        # (cheap alternative to the geodesic path canvases; both exist —
        # reference video_plotting.py:301-329)
        for name, pts in trails.items():
            if axon_subset is not None and name not in axon_subset:
                continue
            if len(pts) >= 2:
                xs_ = [p[0] - x0 for p in pts]
                ys_ = [p[1] - y0 for p in pts]
                ax.plot(xs_, ys_, '-', color=_axon_color(name), lw=1.2,
                        alpha=.8)

    if draw_grid:
        ts = ds.tilesize
        for gy in range(ts - y0 % ts, y1 - y0, ts):
            ax.axhline(gy, color='white', lw=0.3, alpha=0.3)
        for gx in range(ts - x0 % ts, x1 - x0, ts):
            ax.axvline(gx, color='white', lw=0.3, alpha=0.3)

    if draw_scalebar and ds.pixelsize:
        bar_um = 100
        bar_px = bar_um / ds.pixelsize
        xw = x1 - x0
        ax.plot([xw - bar_px - 30, xw - 30],
                [30, 30], color='white', lw=3)
        ax.text(xw - bar_px - 30, 55, f'{bar_um} um', color='white',
                fontsize=7)

    label = f'{description}  frame {t}'
    if ds.dt and ds.incubation_time:
        label += f'  DIV: {ds.get_DIV_point(t)}'
    ax.set_title(label, fontsize=8)
    ax.axis('off')


def draw_all(axon_dets, which_dets='IDed', description='',
             t_y_x_slice=[None, None, None], dets_kwargs=None,
             scnd_dets_kwargs=None, show=False, axon_subset=None,
             save_single_tiles=False, animated=False, dpi=160, fps=6,
             anim_fname_postfix='', draw_true_dets=False, draw_grid=True,
             draw_scalebar=False, draw_axon_reconstructions=False,
             draw_trg_paths=None, draw_brightened_bg=False):
    """Render every frame, optionally assembling a video
    (reference video_plotting.py:17-112)."""
    t_slice, y_slice, x_slice = (t_y_x_slice + [None] * 3)[:3]
    t0, t1 = _slice_or(t_slice, (0, len(axon_dets)))
    t1 = min(t1, len(axon_dets))
    out_dir = axon_dets.dir or '.'
    os.makedirs(out_dir, exist_ok=True)

    frame_files = []
    trail_hist = {}
    recon_hist = {}          # axon -> list[(ys, xs)] geodesic path segments
    last_pos = {}            # axon -> (x, y) at its last IDed frame
    mask = getattr(axon_dets.dataset, 'mask', None)
    for t in range(t0, t1):
        img, true_dets = axon_dets.get_frame_and_truedets(t)
        dets = axon_dets.get_frame_dets(which_dets, t)
        trails = None
        if which_dets == 'IDed':
            for name, row in dets.iterrows():
                pos = (float(row['anchor_x']), float(row['anchor_y']))
                trail_hist.setdefault(name, []).append(pos)
                if draw_axon_reconstructions and mask is not None:
                    # the actual geodesic path between consecutive IDed
                    # detections (reference's A*-path canvases,
                    # video_plotting.py:301-329)
                    if name in last_pos:
                        seg = geodesic_path_pixels(mask, last_pos[name], pos)
                        if seg is not None:
                            recon_hist.setdefault(name, []).append(seg)
                    last_pos[name] = pos
            trails = None if draw_axon_reconstructions else trail_hist
        fig, ax = plt.subplots(figsize=(12, 6), dpi=dpi)
        draw_frame(img[0], dets,
                   true_dets if draw_true_dets and axon_dets.labelled
                   else None,
                   axon_dets, t, ax, description=description,
                   dets_kwargs=dets_kwargs,
                   scnd_dets_kwargs=scnd_dets_kwargs, draw_grid=draw_grid,
                   draw_scalebar=draw_scalebar,
                   draw_brightened_bg=draw_brightened_bg,
                   y_slice=y_slice, x_slice=x_slice,
                   axon_subset=axon_subset, trails=trails,
                   axon_paths=recon_hist if draw_axon_reconstructions
                   else None,
                   trg_paths=draw_trg_paths)
        fname = os.path.join(out_dir,
                             f'{axon_dets.name}_frame{t:0>3}.png')
        fig.savefig(fname, bbox_inches='tight')
        frame_files.append(fname)
        if show:
            plt.show()
        plt.close(fig)

        if save_single_tiles:
            X, tiled_true = axon_dets.get_frame_and_truedets(t,
                                                             unstitched=True)
            for k in range(X.shape[0]):
                fig2, ax2 = plt.subplots(figsize=(4, 4), dpi=dpi)
                ax2.imshow(np.asarray(X[k])[..., X.shape[-1] // 2],
                           cmap='gray')
                ax2.axis('off')
                fig2.savefig(os.path.join(
                    out_dir, f'{axon_dets.name}_frame{t:0>3}_tile{k}.png'))
                plt.close(fig2)

    if animated and frame_files:
        video_fname = os.path.join(
            out_dir, f'{axon_dets.name}_dets{anim_fname_postfix}.'
                     f'{config.VIDEO_FILETYPE}')
        _assemble_video(frame_files, video_fname, fps)
        print(f'Wrote {video_fname}')
        return video_fname
    return frame_files


def _assemble_video(frame_files, video_fname, fps):
    """mp4 via ffmpeg when present, else animated GIF via PIL
    (reference hardcodes the ffmpeg matplotlib writer,
    video_plotting.py:104-112)."""
    from PIL import Image
    if config.VIDEO_ENCODER == 'ffmpeg':
        import subprocess
        import tempfile
        with tempfile.NamedTemporaryFile('w', suffix='.txt',
                                         delete=False) as f:
            for fn in frame_files:
                f.write(f"file '{os.path.abspath(fn)}'\n")
            listfile = f.name
        subprocess.run(['ffmpeg', '-y', '-r', str(fps), '-f', 'concat',
                        '-safe', '0', '-i', listfile, '-pix_fmt', 'yuv420p',
                        '-vf', 'pad=ceil(iw/2)*2:ceil(ih/2)*2',
                        video_fname], check=True, capture_output=True)
        os.unlink(listfile)
    else:
        imgs = [Image.open(fn).convert('P') for fn in frame_files]
        imgs[0].save(video_fname, save_all=True, append_images=imgs[1:],
                     duration=int(1000 / fps), loop=0)


def to_drawable(im):
    """Convert a [C, H, W] or [H, W, C] array (C <= 3) into a float RGB
    image in [0, 1] for matplotlib (counterpart of reference
    utils.py:392-411 ``torch_data2drawable``)."""
    im = np.asarray(im, np.float32)
    if im.ndim == 2:
        im = im[None]
    if im.shape[0] <= 3:
        im = np.moveaxis(im, 0, 2)
    height, width, cchannels = im.shape
    empty = np.zeros((height, width), np.float32)
    if cchannels == 2:
        im = np.stack([empty, im[..., 0], im[..., 1]], axis=2)
    elif cchannels == 1:
        im = np.stack([im[..., 0], empty, empty], axis=-1)
    return np.minimum(im, 1.0)
