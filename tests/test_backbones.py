"""Parity tests for the exact backbone ports (models/backbones.py).

The reference splices torchvision feature stacks in front of its FC head
(machinelearning/model.py:55-83). torchvision is not installed here, so
each test builds the reference-modified stack in PLAIN torch with
torchvision's exact module structure and state-dict key names (derived
from torchvision source: alexnet.features indices, resnet18
conv1/bn1/layer{k}.{j}, mobilenet_v3_small features.{i}.block.{j}), runs
it in eval mode, converts the state dict with
models/torch_convert, and asserts the flax port computes the same
function. All parameters and BN statistics are randomized first so the
comparison is not trivially satisfied by default-initialized identities.
"""
import numpy as np
import pytest

torch = pytest.importorskip('torch')
import torch.nn as tnn  # noqa: E402

from axtrack_tpu.models.backbones import (  # noqa: E402
    MOBILENET_V3_SMALL_CONF, BACKBONES, _make_divisible)
from axtrack_tpu.models.torch_convert import (  # noqa: E402
    _map_backbone, _normalize_backbone_keys, backbone_state_dict_to_flax,
    torch_state_dict_to_flax)

IN_C = 5      # (2*TEMPORAL_CONTEXT+1) channels, motion 'exclude'
TS = 64       # small tilesize: full stacks stay CPU-fast


# --- torch replicas (torchvision structure + the reference's real edits) ---

def _cna(in_c, out_c, k, s=1, groups=1, act='hardswish'):
    """torchvision Conv2dNormActivation (mobilenetv3 flavor)."""
    layers = [tnn.Conv2d(in_c, out_c, k, s, (k - 1) // 2, groups=groups,
                         bias=False),
              tnn.BatchNorm2d(out_c, eps=0.001, momentum=0.01)]
    if act == 'hardswish':
        layers.append(tnn.Hardswish())
    elif act == 'relu':
        layers.append(tnn.ReLU())
    return tnn.Sequential(*layers)


class _TorchSE(tnn.Module):
    """torchvision SqueezeExcitation (fc1/fc2 naming)."""

    def __init__(self, c, squeeze):
        super().__init__()
        self.avgpool = tnn.AdaptiveAvgPool2d(1)
        self.fc1 = tnn.Conv2d(c, squeeze, 1)
        self.fc2 = tnn.Conv2d(squeeze, c, 1)
        self.activation = tnn.ReLU()
        self.scale_activation = tnn.Hardsigmoid()

    def forward(self, x):
        s = self.activation(self.fc1(self.avgpool(x)))
        return x * self.scale_activation(self.fc2(s))


class _TorchIR(tnn.Module):
    """torchvision mobilenetv3 InvertedResidual ('block' Sequential)."""

    def __init__(self, cfg):
        super().__init__()
        in_c, k, exp, out, se, act, stride = cfg
        layers = []
        if exp != in_c:
            layers.append(_cna(in_c, exp, 1, act=act))
        layers.append(_cna(exp, exp, k, stride, groups=exp, act=act))
        if se:
            layers.append(_TorchSE(exp, _make_divisible(exp // 4, 8)))
        layers.append(_cna(exp, out, 1, act=None))
        self.block = tnn.Sequential(*layers)
        self.use_res = stride == 1 and in_c == out

    def forward(self, x):
        return x + self.block(x) if self.use_res else self.block(x)


def torch_mobilenet_features(in_c):
    # i==0 replaced by a bare biased conv (reference model.py:74-77);
    # i==3 stride / i==6 padding attribute edits are no-ops on IR blocks
    mods = [tnn.Conv2d(in_c, 16, 3, 2, (1, 1), bias=True)]
    mods += [_TorchIR(cfg) for cfg in MOBILENET_V3_SMALL_CONF]
    mods.append(_cna(96, 576, 1, act='hardswish'))
    return tnn.Sequential(*mods)


def torch_alexnet_features(in_c):
    # all three reference edits are REAL on alexnet: replaced first conv,
    # features[3].stride=(2,2), features[6].padding=(2,2)
    return tnn.Sequential(
        tnn.Conv2d(in_c, 64, 3, 2, (2, 2), bias=True), tnn.ReLU(),
        tnn.MaxPool2d(3, 2),
        tnn.Conv2d(64, 192, 5, 2, 2), tnn.ReLU(),
        tnn.MaxPool2d(3, 2),
        tnn.Conv2d(192, 384, 3, 1, (2, 2)), tnn.ReLU(),
        tnn.Conv2d(384, 256, 3, 1, 1), tnn.ReLU(),
        tnn.Conv2d(256, 256, 3, 1, 1), tnn.ReLU(),
        tnn.MaxPool2d(3, 2))


class _TorchBasic(tnn.Module):
    def __init__(self, in_c, out_c, stride):
        super().__init__()
        self.conv1 = tnn.Conv2d(in_c, out_c, 3, stride, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(out_c)
        self.relu = tnn.ReLU()
        self.conv2 = tnn.Conv2d(out_c, out_c, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(out_c)
        self.downsample = None
        if stride != 1 or in_c != out_c:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(in_c, out_c, 1, stride, bias=False),
                tnn.BatchNorm2d(out_c))

    def forward(self, x):
        h = self.relu(self.bn1(self.conv1(x)))
        h = self.bn2(self.conv2(h))
        identity = self.downsample(x) if self.downsample else x
        return self.relu(h + identity)


class _TorchResNetFeatures(tnn.Module):
    """resnet18 conv1..layer4 with the reference's conv1 replacement."""

    def __init__(self, in_c):
        super().__init__()
        self.conv1 = tnn.Conv2d(in_c, 64, 3, 2, (2, 2), bias=True)
        self.bn1 = tnn.BatchNorm2d(64)
        self.relu = tnn.ReLU()
        self.maxpool = tnn.MaxPool2d(3, 2, 1)
        widths = (64, 128, 256, 512)
        in_w = 64
        for k, w in enumerate(widths):
            blocks = tnn.Sequential(_TorchBasic(in_w, w, 2 if k > 0 else 1),
                                    _TorchBasic(w, w, 1))
            setattr(self, f'layer{k + 1}', blocks)
            in_w = w

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        for k in range(4):
            x = getattr(self, f'layer{k + 1}')(x)
        return x


_TORCH_BUILDERS = {
    'mobilenet': torch_mobilenet_features,
    'alexnet': torch_alexnet_features,
    'resnet': _TorchResNetFeatures,
}


def _randomize(module, seed):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in module.parameters():
            p.uniform_(-0.4, 0.4, generator=g)
        for name, b in module.named_buffers():
            if name.endswith('running_mean'):
                b.uniform_(-0.3, 0.3, generator=g)
            elif name.endswith('running_var'):
                b.uniform_(0.5, 1.5, generator=g)
    return module


def _raw_keys(which, state_dict):
    """Reference-wrapped -> raw torchvision key flavor."""
    if which == 'resnet':
        return state_dict            # already conv1/bn1/layer{k} naming
    return {f'features.{k}': v for k, v in state_dict.items()}


@pytest.mark.parametrize('which', ['mobilenet', 'alexnet', 'resnet'])
class TestBackboneParity:
    def _pair(self, which, seed=0):
        tm = _randomize(_TORCH_BUILDERS[which](IN_C), seed).eval()
        sd = {k: v for k, v in tm.state_dict().items()
              if 'num_batches_tracked' not in k}
        params, stats, missing = _map_backbone(
            _normalize_backbone_keys(_raw_keys(which, sd), which), which)
        assert missing == [], missing
        fm = BACKBONES[which]()
        variables = {'params': params}
        if stats:
            variables['batch_stats'] = stats
        return tm, fm, variables

    def test_forward_parity(self, which):
        tm, fm, variables = self._pair(which)
        rng = np.random.default_rng(1)
        x = rng.normal(size=(2, IN_C, TS, TS)).astype(np.float32)
        with torch.no_grad():
            want = tm(torch.from_numpy(x)).numpy()
        got = np.asarray(fm.apply(variables, np.transpose(x, (0, 2, 3, 1)),
                                  train=False))
        # alexnet has no BN, so randomized-weight activations grow to ~1e4
        # through five conv layers; rtol absorbs f32 reduce-order noise at
        # that dynamic range (worst observed: 0.26% on one element)
        np.testing.assert_allclose(np.transpose(got, (0, 3, 1, 2)), want,
                                   rtol=6e-3, atol=2e-4)

    def test_out_hw_matches_forward(self, which):
        _, fm, variables = self._pair(which)
        h, w, c = BACKBONES[which].out_hw(TS)
        out = fm.apply(variables, np.zeros((1, TS, TS, IN_C), np.float32),
                       train=False)
        assert out.shape == (1, h, w, c)

    def test_converted_tree_matches_init(self, which):
        """The converter's tree must be loadable where init put leaves:
        identical key paths and shapes."""
        import jax
        _, fm, variables = self._pair(which)
        init_vars = fm.init(jax.random.PRNGKey(0),
                            np.zeros((1, TS, TS, IN_C), np.float32),
                            train=False)
        for col in init_vars:
            want = jax.tree_util.tree_map(lambda a: a.shape, init_vars[col])
            got = jax.tree_util.tree_map(lambda a: a.shape,
                                         variables.get(col, {}))
            assert want == got, f'{col} tree mismatch'


def test_full_model_checkpoint_roundtrip():
    """Reference-format checkpoint (ConvNet.block_* + fcs.*) for a string
    ARCHITECTURE loads through torch_state_dict_to_flax and matches a torch
    forward of backbone + FC head (exercises the NCHW->NHWC flatten perm)."""
    import jax.numpy as jnp
    from axtrack_tpu.models.yolo import build_model
    from axtrack_tpu.params import get_default_parameters

    which = 'alexnet'
    P = dict(get_default_parameters())
    P['ARCHITECTURE'] = which
    P['TILESIZE'] = TS
    feats = _randomize(_TORCH_BUILDERS[which](IN_C), 3).eval()
    h, w, c = BACKBONES[which].out_hw(TS)
    fcs = _randomize(tnn.Sequential(
        tnn.Flatten(), tnn.Linear(h * w * c, 1024), tnn.Sigmoid(),
        tnn.Linear(1024, 1024), tnn.Sigmoid(),
        tnn.Linear(1024, 12 * 12 * 3)), 4).eval()

    sd = {f'ConvNet.block_{k}': v for k, v in feats.state_dict().items()
          if 'num_batches_tracked' not in k}
    sd.update({f'fcs.{k}': v for k, v in fcs.state_dict().items()})
    variables = torch_state_dict_to_flax(sd, P)

    rng = np.random.default_rng(5)
    x = rng.normal(size=(2, IN_C, TS, TS)).astype(np.float32)
    with torch.no_grad():
        want = fcs(feats(torch.from_numpy(x))).numpy()
    model = build_model(P)
    got = np.asarray(model.apply(variables,
                                 jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
                                 train=False))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=3e-4)


def test_raw_torchvision_merge_skips_stem():
    """A raw torchvision state dict (3-channel stem) merges onto random-init
    variables: stem + FC head stay, everything else loads (the reference's
    _from_pretrained splice semantics)."""
    import jax
    from axtrack_tpu.models.yolo import build_model, init_variables
    from axtrack_tpu.params import get_default_parameters

    P = dict(get_default_parameters())
    P['ARCHITECTURE'] = 'mobilenet'
    P['TILESIZE'] = TS
    model = build_model(P)
    variables = init_variables(model, P, seed=0)

    tm = _randomize(torch_mobilenet_features(3), 7)   # 3-ch: raw torchvision
    sd = {f'features.{k}': v for k, v in tm.state_dict().items()
          if 'num_batches_tracked' not in k}
    before_stem = np.asarray(
        variables['params']['backbone']['block_0']['kernel'])
    merged, loaded, skipped = backbone_state_dict_to_flax(
        sd, 'mobilenet', P, variables)

    assert any('block_1' in n for n in loaded)
    assert any('block_12' in n for n in loaded)
    # stem kernel is shape-incompatible (3 vs 5 input channels): skipped
    assert any('block_0' in s for s in skipped)
    np.testing.assert_array_equal(
        merged['params']['backbone']['block_0']['kernel'], before_stem)
    # loaded leaves really moved
    got = np.asarray(
        merged['params']['backbone']['block_12']['conv']['kernel'])
    want = sd['features.12.0.weight'].numpy().transpose(2, 3, 1, 0)
    np.testing.assert_array_equal(got, want)
    # and the merged variables drive the full model
    out = model.apply(jax.tree_util.tree_map(np.asarray, merged),
                      np.zeros((1, TS, TS, IN_C), np.float32), train=False)
    assert np.isfinite(np.asarray(out)).all()
