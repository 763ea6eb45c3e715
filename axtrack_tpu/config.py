"""Global constants and paths.

TPU-native counterpart of the reference's ``axtrack/config.py``
(/root/reference/axtrack/config.py:1-53). Differences by design:

- No hardcoded personal data dir (reference config.py:6); everything is
  overridable via environment variables.
- ``DEFAULT_DEVICE`` names a JAX platform ('tpu'/'cpu'), resolved lazily —
  the reference pinned torch 'cpu' (config.py:13).
- Video encoding falls back to imageio/PIL GIF when ffmpeg is absent.
"""
import os

PKG_DIR = os.path.abspath(os.path.dirname(__file__) + '/..')

# Data directories: overridable, default to in-repo locations.
_DATA_DIR = os.environ.get('AXTRACK_DATA_DIR', os.path.join(PKG_DIR, 'data'))
DEPLOYED_MODEL_DIR = os.environ.get(
    'AXTRACK_DEPLOYED_MODEL_DIR', os.path.join(PKG_DIR, 'deployed_model'))
TRAINING_DATA_DIR = os.path.join(_DATA_DIR, 'training_data')
OUTPUT_DIR = os.environ.get(
    'AXTRACK_OUTPUT_DIR', os.path.join(_DATA_DIR, 'model_output'))

# JAX platform preference. 'auto' = first available of tpu, cpu.
DEFAULT_DEVICE = os.environ.get('AXTRACK_DEVICE', 'auto')
DEFAULT_NUM_WORKERS = 3

# Video encoder: 'ffmpeg' if on PATH else 'gif' (PIL-based).
VIDEO_ENCODER = 'ffmpeg' if any(
    os.access(os.path.join(p, 'ffmpeg'), os.X_OK)
    for p in os.environ.get('PATH', '').split(os.pathsep) if p) else 'gif'

SPACER = '========================================================'

# Train/test frame-split constants mirroring reference config.py:19-23
# (Dat1 37 frames - Dat2 80 frames - Dat3 210 frames).
WHOLE_DATASET_TRAIN_FRAMES = (list(range(2, 37 + 80 - 20 - 4))
                              + list(range(37 + 80 + 20 + 4, 37 + 80 + 210 - 2)))
WHOLE_DATASET_TEST_FRAMES = list(range(37 + 80 - 20, 37 + 80 + 20))
ALLTRAIN_DATASET_TRAIN_FRAMES = range(2, 37 + 80 + 210 - 2)
ALLTRAIN_DATASET_TEST_FRAMES = range(2, 6)

# Plot style (reference config.py:26-53).
TRAIN_Ps = {'linewidth': 3, 'alpha': .8, 'linestyle': ':'}
TEST_Ps = {'linewidth': 3, 'alpha': .8}
PREDICTED_BOXES_KWARGS = {'alpha': 1, 'linestyle': 'dashed', 'linewidth': 1,
                          'facecolor': 'none', 'edgecolor': 'hsv'}
GROUNDTRUTH_BOXES_KWARGS = {'alpha': .6, 'linestyle': 'solid', 'linewidth': 1.2,
                            'facecolor': 'none', 'edgecolor': 'white'}
FP_BOXES_KWARGS = {'alpha': .8, 'linestyle': 'solid', 'linewidth': 1,
                   'facecolor': 'none', 'edgecolor': 'orange'}
FN_BOXES_KWARGS = {'alpha': .8, 'linestyle': 'solid', 'linewidth': 1,
                   'facecolor': 'none', 'edgecolor': 'teal'}

FIGURE_FILETYPE = 'svg'
VIDEO_FILETYPE = 'mp4' if VIDEO_ENCODER == 'ffmpeg' else 'gif'
SMALL_FONTS = 14.5
FONTS = 18
SMALL_FIGSIZE = (4.5, 3.5)
MEDIUM_FIGSIZE = (5.6, 4.2)
LARGE_FIGSIZE = (14.6, 6.8)
BARPLOT_HEIGHT = 4.2

DARK_GRAY = '#6b6b6b'
GRAY = '#858585'
LIGHT_GRAY = '#cfcfcf'
DEFAULT_COLORS = ['#729C27', '#A85C2A', '#1B6C5C', '#892259', '#273673',
                  '#A0F40A', '#08C6A1', '#FF6B0B', '#E20A7C', '#2042CD']


def resolve_device(device: str = None):
    """Map a device preference string to a JAX device.

    'auto' picks TPU if present, else CPU. Also accepts 'tpu', 'cpu',
    'tpu:0' style strings.
    """
    import jax
    device = device or DEFAULT_DEVICE
    if device in (None, 'auto'):
        return jax.devices()[0]
    plat, _, idx = device.partition(':')
    try:
        devs = jax.devices(plat)
    except RuntimeError:
        devs = jax.devices()
    return devs[int(idx) if idx else 0]
