"""YOLO_AXTrack detector in flax.

TPU-native rebuild of the reference CNN (machinelearning/model.py:5-125):
a conv stack built from the ARCHITECTURE spec (exp_parameters.py:38-57), a
2x1024 sigmoid FC head, output reshaped to [ntiles, Sx, Sy, 3].

TPU-first choices: NHWC layout (XLA-TPU native), explicit ((1,1),(1,1)) conv
padding to reproduce the reference's torch geometry exactly, optional
bfloat16 compute with float32 params/statistics, and a
``detect_axons``-equivalent jitted apply for batched tile inference.

Custom backbones 'mobilenet'/'alexnet'/'resnet' (model.py:55-83) are
supported as architecture strings building EXACT flax ports of the
reference-modified torchvision feature stacks (models/backbones.py);
weights are randomly initialized offline, and
torch_convert.backbone_state_dict_to_flax loads real torchvision weights
when a checkpoint is available.
"""
from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn


def make_activation(spec):
    """Activation from a framework-neutral spec ('sigmoid', ('leaky_relu', a),
    ...). The reference stored torch modules in params (exp_parameters.py:63)."""
    if callable(spec):
        return spec
    if isinstance(spec, (tuple, list)):
        name, *args = spec
    else:
        name, args = spec, ()
    name = name.lower()
    if name == 'leaky_relu':
        slope = args[0] if args else 0.01
        return lambda x: nn.leaky_relu(x, negative_slope=slope)
    if name == 'sigmoid':
        return nn.sigmoid
    if name == 'relu':
        return nn.relu
    if name == 'tanh':
        return jnp.tanh
    raise ValueError(f'unknown activation {spec!r}')


class CNNBlock(nn.Module):
    """Conv2d + BatchNorm + activation (reference model.py:5-18)."""
    out_channels: int
    kernel_size: int
    stride: int
    groups: int
    activation: Any
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.out_channels,
                    (self.kernel_size, self.kernel_size),
                    strides=(self.stride, self.stride),
                    padding=((1, 1), (1, 1)),
                    feature_group_count=self.groups,
                    use_bias=True,
                    dtype=self.dtype,
                    param_dtype=jnp.float32)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32)(x)
        return make_activation(self.activation)(x)


def _backbone(name, dtype):
    """Exact flax port of the reference-modified torchvision feature stack
    (model.py:55-83) — see models/backbones.py for the layer-for-layer
    derivation (incl. which of the reference's attribute edits are real)."""
    from .backbones import BACKBONES
    if name not in BACKBONES:
        raise ValueError(f'unknown backbone {name!r}')
    return BACKBONES[name](dtype=dtype, name='backbone')


class YOLOAxTrack(nn.Module):
    """The growth-cone detector (reference model.py:20-125).

    Input: f32[N, tilesize, tilesize, C] NHWC tiles.
    Output: f32[N, Sy*Sx*3] (flat), reshape with ``reshape_grid``.
    """
    architecture: Any
    activation: Any = ('leaky_relu', 0.1)
    tilesize: int = 512
    Sy: int = 12
    Sx: int = 12
    dtype: Any = jnp.float32
    # FC-head compute dtype; None = follow ``dtype``. The conv stack holds
    # ~97% of the FLOPs (2.6 GFLOP/tile vs the head's 0.1), so
    # dtype=bfloat16 + fc_dtype=float32 keeps nearly all of the MXU bf16
    # speed while the confidence head — whose near-threshold rounding flips
    # are what detection parity is sensitive to — stays in f32.
    fc_dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        arch = self.architecture
        if isinstance(arch, str):
            fc_spec = [('FC', 1024), ('activation', 'sigmoid'),
                       ('FC', 1024), ('activation', 'sigmoid')]
            x = _backbone(arch, self.dtype)(x.astype(self.dtype), train)
        else:
            conv_spec, fc_spec = arch[0], arch[1]
            x = x.astype(self.dtype)
            for layer in conv_spec:
                if layer == 'M':
                    x = nn.max_pool(x, (2, 2), strides=(2, 2))
                else:
                    k, out_c, stride, groups = layer
                    x = CNNBlock(out_c, k, stride, groups, self.activation,
                                 dtype=self.dtype)(x, train)

        fc_dtype = self.dtype if self.fc_dtype is None else self.fc_dtype
        x = x.reshape(x.shape[0], -1).astype(jnp.float32)
        for element_type, param in fc_spec:
            if element_type == 'FC':
                x = nn.Dense(param, dtype=fc_dtype,
                             param_dtype=jnp.float32)(x)
                x = x.astype(jnp.float32)
            elif element_type == 'dropout':
                x = nn.Dropout(param, deterministic=not train)(x)
            elif element_type == 'activation':
                x = make_activation(param)(x)
        x = nn.Dense(self.Sy * self.Sx * 3, param_dtype=jnp.float32)(x)
        return x.astype(jnp.float32)

    def reshape_grid(self, pred):
        """[N, Sy*Sx*3] -> [N, Sx, Sy, 3] — the reference's detect_axons
        reshape (model.py:123); dim 1 is the x grid cell."""
        return pred.reshape(pred.shape[0], self.Sx, self.Sy, 3)


def initial_in_channels(params):
    """Input channel count from motion mode + temporal context
    (core_functionality.py:62-67)."""
    per_frame = {'include': 3, 'only': 2, 'exclude': 1}[params['USE_MOTION_DATA']]
    return per_frame * (params['TEMPORAL_CONTEXT'] * 2 + 1)


def build_model(params, dtype=jnp.float32, fc_dtype=None):
    return YOLOAxTrack(architecture=params['ARCHITECTURE'],
                       activation=params['ACTIVATION_FUNCTION'],
                       tilesize=params['TILESIZE'],
                       Sy=params['SY'], Sx=params['SX'],
                       dtype=dtype, fc_dtype=fc_dtype)


def init_variables(model, params, seed=0):
    c = initial_in_channels(params)
    x = jnp.zeros((1, model.tilesize, model.tilesize, c), jnp.float32)
    return model.init(jax.random.PRNGKey(seed), x, train=False)


def detect_axons(model, variables, X):
    """Eval-mode batched tile inference (reference model.py:119-125).

    X: f32[ntiles, ts, ts, C]. Returns f32[ntiles, Sx, Sy, 3].
    """
    pred = model.apply(variables, X, train=False)
    return model.reshape_grid(pred)
