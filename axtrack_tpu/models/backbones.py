"""Exact flax ports of the reference's pretrained-backbone feature stacks.

The reference's ``YOLO_AXTrack._from_pretrained`` (machinelearning/
model.py:55-83) splices a torchvision feature extractor in front of the FC
head when ARCHITECTURE is the string 'mobilenet' / 'alexnet' / 'resnet',
with three surgical edits applied to the torchvision stack:

  i == 0: the first module is REPLACED by a bare
          ``Conv2d(in_c, out_c, kernel=3, stride=2, padding=p, bias=True)``
          (out_c/p: mobilenet 16/(1,1); alexnet 64/(2,2); resnet 64/(2,2)).
          For mobilenet this drops the stem's BatchNorm+Hardswish (the whole
          Conv2dNormActivation is replaced); for resnet ``bn1`` at i == 1
          survives and still applies.
  i == 3: ``module.stride = (2,2)``. On alexnet features[3] is a Conv2d, so
          the stride really changes (5x5 conv goes stride 2). On mobilenet
          (InvertedResidual) and resnet (maxpool already stride 2 /
          Sequential of BasicBlocks) the attribute assignment has NO effect
          on the computation — torch just stores an unused attribute.
  i == 6: ``module.padding = (2,2)``. Real on alexnet (features[6] Conv2d
          3x3 gets padding 2); a no-op attribute on mobilenet/resnet.

These modules reproduce the EFFECTIVE architectures (the edits that change
math applied, the no-ops not), layer-for-layer against torchvision 0.x's
``alexnet().features``, ``resnet18()`` (conv1..layer4) and
``mobilenet_v3_small().features``, in NHWC for TPU. Weight parity with a
real torchvision checkpoint is then a key-mapping away
(torch_convert.backbone_state_dict_to_flax); the weights themselves cannot
be downloaded in this offline environment.

NOTE the reference's own string-architecture path is bitrotted: with
ARCHITECTURE='mobilenet' it calls ``self._create_fcs(self.architecture[1])``
— indexing the *string* — and crashes building the FC head (model.py:42-43).
Here the string architecture composes with the default 2x1024 sigmoid FC
head and is fully functional (the intended semantics, divergence documented
in README).
"""
from typing import Any

import jax.numpy as jnp
import flax.linen as nn


def hardswish(x):
    """torch F.hardswish: x * relu6(x + 3) / 6."""
    return x * jnp.clip(x + 3.0, 0.0, 6.0) / 6.0


def hardsigmoid(x):
    """torch F.hardsigmoid: relu6(x + 3) / 6."""
    return jnp.clip(x + 3.0, 0.0, 6.0) / 6.0


def _make_divisible(v, divisor=8):
    """torchvision.models._utils._make_divisible (channel rounding)."""
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


_ACTS = {'relu': nn.relu, 'hardswish': hardswish, None: lambda x: x}


class ConvNormAct(nn.Module):
    """torchvision Conv2dNormActivation: Conv (no bias) + BatchNorm + act.

    Param tree: {conv: {kernel}, bn: {scale, bias}} +
    batch_stats {bn: {mean, var}} — fixed names so the torch key mapping is
    mechanical.
    """
    out_c: int
    kernel: int
    stride: int = 1
    groups: int = 1
    act: Any = 'relu'
    bn_eps: float = 1e-5
    bn_momentum: float = 0.9          # flax decay = 1 - torch momentum
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        p = (self.kernel - 1) // 2    # torchvision default padding
        x = nn.Conv(self.out_c, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=((p, p), (p, p)),
                    feature_group_count=self.groups, use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32,
                    name='conv')(x)
        x = nn.BatchNorm(use_running_average=not train,
                         momentum=self.bn_momentum, epsilon=self.bn_eps,
                         dtype=jnp.float32, name='bn')(x)
        return _ACTS[self.act](x)


class SqueezeExcite(nn.Module):
    """torchvision SqueezeExcitation: avgpool -> fc1 1x1 -> ReLU -> fc2 1x1
    -> Hardsigmoid -> channel scale. fc1/fc2 are biased 1x1 convs."""
    squeeze_c: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        s = jnp.mean(x.astype(jnp.float32), axis=(1, 2), keepdims=True)
        s = nn.Conv(self.squeeze_c, (1, 1), use_bias=True,
                    param_dtype=jnp.float32, name='fc1')(s)
        s = nn.relu(s)
        s = nn.Conv(x.shape[-1], (1, 1), use_bias=True,
                    param_dtype=jnp.float32, name='fc2')(s)
        return x * hardsigmoid(s).astype(x.dtype)


class InvertedResidual(nn.Module):
    """torchvision mobilenetv3 InvertedResidual (dilation 1).

    Submodule names: expand (absent when exp_c == in_c), dw, se (when
    use_se), project — each a ConvNormAct/SqueezeExcite above.
    """
    in_c: int
    kernel: int
    exp_c: int
    out_c: int
    use_se: bool
    act: str
    stride: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = x
        if self.exp_c != self.in_c:
            h = ConvNormAct(self.exp_c, 1, act=self.act, bn_eps=1e-3,
                            bn_momentum=0.99, dtype=self.dtype,
                            name='expand')(h, train)
        h = ConvNormAct(self.exp_c, self.kernel, stride=self.stride,
                        groups=self.exp_c, act=self.act, bn_eps=1e-3,
                        bn_momentum=0.99, dtype=self.dtype,
                        name='dw')(h, train)
        if self.use_se:
            h = SqueezeExcite(_make_divisible(self.exp_c // 4, 8),
                              dtype=self.dtype, name='se')(h)
        h = ConvNormAct(self.out_c, 1, act=None, bn_eps=1e-3,
                        bn_momentum=0.99, dtype=self.dtype,
                        name='project')(h, train)
        if self.stride == 1 and self.in_c == self.out_c:
            h = h + x
        return h


# mobilenet_v3_small bneck table (torchvision _mobilenet_v3_conf):
# (in_c, kernel, expanded_c, out_c, use_se, activation, stride)
MOBILENET_V3_SMALL_CONF = [
    (16, 3, 16, 16, True, 'relu', 2),
    (16, 3, 72, 24, False, 'relu', 2),
    (24, 3, 88, 24, False, 'relu', 1),
    (24, 5, 96, 40, True, 'hardswish', 2),
    (40, 5, 240, 40, True, 'hardswish', 1),
    (40, 5, 240, 40, True, 'hardswish', 1),
    (40, 5, 120, 48, True, 'hardswish', 1),
    (48, 5, 144, 48, True, 'hardswish', 1),
    (48, 5, 288, 96, True, 'hardswish', 2),
    (96, 5, 576, 96, True, 'hardswish', 1),
    (96, 5, 576, 96, True, 'hardswish', 1),
]


class MobileNetV3SmallFeatures(nn.Module):
    """mobilenet_v3_small().features with the reference's stem replacement
    (a bare biased Conv2d(in_c, 16, 3, stride 2, padding 1) — no BN, no
    Hardswish). block_{i} mirrors features[i]."""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(16, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                    use_bias=True, dtype=self.dtype,
                    param_dtype=jnp.float32, name='block_0')(x)
        for i, cfg in enumerate(MOBILENET_V3_SMALL_CONF):
            x = InvertedResidual(*cfg, dtype=self.dtype,
                                 name=f'block_{i + 1}')(x, train)
        return ConvNormAct(576, 1, act='hardswish', bn_eps=1e-3,
                           bn_momentum=0.99, dtype=self.dtype,
                           name='block_12')(x, train)

    @staticmethod
    def out_hw(tilesize):
        h = _conv_out(tilesize, 3, 2, 1)              # stem
        for (_, k, _, _, _, _, s) in MOBILENET_V3_SMALL_CONF:
            if s == 2:
                h = _conv_out(h, k, 2, (k - 1) // 2)
        return h, h, 576


class AlexNetFeatures(nn.Module):
    """alexnet().features with the reference's edits (all three are real
    here): block_0 Conv(in,64,3,s2,p2), block_3 Conv(64,192,5,S2,p2),
    block_6 Conv(192,384,3,P2), block_8/10 Conv 3x3 p1, maxpools 3/2."""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        def conv(out_c, k, s, p, name):
            return nn.Conv(out_c, (k, k), strides=(s, s),
                           padding=((p, p), (p, p)), use_bias=True,
                           dtype=self.dtype, param_dtype=jnp.float32,
                           name=name)

        x = nn.relu(conv(64, 3, 2, 2, 'block_0')(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = nn.relu(conv(192, 5, 2, 2, 'block_3')(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = nn.relu(conv(384, 3, 1, 2, 'block_6')(x))
        x = nn.relu(conv(256, 3, 1, 1, 'block_8')(x))
        x = nn.relu(conv(256, 3, 1, 1, 'block_10')(x))
        return nn.max_pool(x, (3, 3), strides=(2, 2))

    @staticmethod
    def out_hw(tilesize):
        h = _conv_out(tilesize, 3, 2, 2)
        h = _conv_out(h, 3, 2, 0)
        h = _conv_out(h, 5, 2, 2)
        h = _conv_out(h, 3, 2, 0)
        h = _conv_out(h, 3, 1, 2)
        h = _conv_out(h, 3, 2, 0)
        return h, h, 256


class BasicBlock(nn.Module):
    """torchvision resnet BasicBlock: conv1/bn1/relu/conv2/bn2 + identity
    (1x1 downsample conv+bn when the block changes stride/width)."""
    out_c: int
    stride: int = 1
    downsample: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        def conv(out_c, k, s, name):
            p = (k - 1) // 2
            return nn.Conv(out_c, (k, k), strides=(s, s),
                           padding=((p, p), (p, p)), use_bias=False,
                           dtype=self.dtype, param_dtype=jnp.float32,
                           name=name)

        def bn(name):
            return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                epsilon=1e-5, dtype=jnp.float32, name=name)

        h = nn.relu(bn('bn1')(conv(self.out_c, 3, self.stride, 'conv1')(x)))
        h = bn('bn2')(conv(self.out_c, 3, 1, 'conv2')(h))
        identity = x
        if self.downsample:
            identity = bn('ds_bn')(
                conv(self.out_c, 1, self.stride, 'ds_conv')(x))
        return nn.relu(h + identity)


class ResNet18Features(nn.Module):
    """[conv1, bn1, relu, maxpool, layer1..layer4] of resnet18() with the
    reference's conv1 replacement (biased 3x3 stride-2 padding-2). Names:
    block_0 (conv1), block_1 (bn1), block_{4+k}_{j} (layer{k+1}[j])."""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(64, (3, 3), strides=(2, 2), padding=((2, 2), (2, 2)),
                    use_bias=True, dtype=self.dtype,
                    param_dtype=jnp.float32, name='block_0')(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32, name='block_1')(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2),
                        padding=((1, 1), (1, 1)))
        for k, width in enumerate((64, 128, 256, 512)):
            for j in range(2):
                first = j == 0 and k > 0
                x = BasicBlock(width, stride=2 if first else 1,
                               downsample=first, dtype=self.dtype,
                               name=f'block_{4 + k}_{j}')(x, train)
        return x

    @staticmethod
    def out_hw(tilesize):
        h = _conv_out(tilesize, 3, 2, 2)              # conv1
        h = _conv_out(h, 3, 2, 1)                     # maxpool
        for _ in range(3):                            # layer2..4 stride 2
            h = _conv_out(h, 3, 2, 1)
        return h, h, 512


def _conv_out(h, k, s, p):
    return (h + 2 * p - k) // s + 1


BACKBONES = {
    'mobilenet': MobileNetV3SmallFeatures,
    'alexnet': AlexNetFeatures,
    'resnet': ResNet18Features,
}
