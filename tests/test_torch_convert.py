"""torch -> flax converter: numerical parity with a real torch forward.

Builds a torch model with the reference's module layout/semantics
(Conv(pad 1)+BN+leaky -> MaxPool -> Flatten -> Linear/sigmoid -> head,
reference machinelearning/model.py:5-117), randomizes ALL weights and BN
running stats, converts the state dict, and asserts the flax detector
reproduces the torch forward on random tiles.
"""
import numpy as np
import pytest

torch = pytest.importorskip('torch')
import torch.nn as nn  # noqa: E402

from axtrack_tpu.params import get_default_parameters
from axtrack_tpu.models.yolo import build_model, detect_axons
from axtrack_tpu.models.torch_convert import (torch_state_dict_to_flax,
                                              load_torch_checkpoint)


def small_P():
    P = get_default_parameters()
    P.update(dict(TILESIZE=64, ARCHITECTURE=[
        [(3, 8, 2, 1), 'M', (3, 16, 1, 1), 'M'],
        [('FC', 32), ('activation', 'sigmoid')],
    ]))
    return P


def build_torch_reference_model(P, in_channels=5):
    """Reference-layout torch model (named like model.py's Sequentials)."""
    act = nn.LeakyReLU(0.1)
    conv_spec, fc_spec = P['ARCHITECTURE']

    class Block(nn.Module):
        def __init__(self, in_c, out_c, k, s, g):
            super().__init__()
            self.conv = nn.Conv2d(in_c, out_c, k, s, padding=(1, 1),
                                  groups=g, bias=True)
            self.batchnorm = nn.BatchNorm2d(out_c)

        def forward(self, x):
            return act(self.batchnorm(self.conv(x)))

    convnet = nn.Sequential()
    in_c = in_channels
    for i, layer in enumerate(conv_spec):
        if layer == 'M':
            convnet.add_module(f'ConvBlock_{i}', nn.MaxPool2d(2, 2))
        else:
            k, out_c, s, g = layer
            convnet.add_module(f'ConvBlock_{i}', Block(in_c, out_c, k, s, g))
            in_c = out_c

    with torch.no_grad():
        n_feat = convnet(torch.zeros(1, in_channels, P['TILESIZE'],
                                     P['TILESIZE'])).flatten(1).shape[1]
    fcs = nn.Sequential(nn.Flatten())
    d = n_feat
    for et, param in fc_spec:
        if et == 'FC':
            fcs.append(nn.Linear(d, param))
            d = param
        elif et == 'activation':
            fcs.append(nn.Sigmoid())
    fcs.append(nn.Linear(d, P['SY'] * P['SX'] * 3))

    class Model(nn.Module):
        def __init__(self):
            super().__init__()
            self.ConvNet = convnet
            self.fcs = fcs

        def forward(self, x):
            return self.fcs(self.ConvNet(x))

    return Model()


def randomize(model, seed=0):
    g = torch.Generator().manual_seed(seed)
    sd = model.state_dict()
    for k, v in sd.items():
        if v.dtype.is_floating_point:
            sd[k] = torch.randn(v.shape, generator=g) * 0.3
        if k.endswith('running_var'):
            sd[k] = torch.rand(v.shape, generator=g) + 0.5
    model.load_state_dict(sd)


class TestTorchConvert:
    def test_forward_parity(self):
        P = small_P()
        tm = build_torch_reference_model(P)
        randomize(tm)
        tm.eval()

        variables = torch_state_dict_to_flax(tm.state_dict(), P)
        fm = build_model(P)

        rng = np.random.default_rng(0)
        X = rng.random((3, 64, 64, 5), np.float32)
        with torch.no_grad():
            want = tm(torch.from_numpy(X.transpose(0, 3, 1, 2))).numpy()
        want = want.reshape(3, P['SX'], P['SY'], 3)

        got = np.asarray(detect_axons(fm, variables, X))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_checkpoint_file_roundtrip(self, tmp_path):
        """The reference's E{epoch}.pth wrapper format loads + converts."""
        P = small_P()
        tm = build_torch_reference_model(P)
        randomize(tm, seed=3)
        tm.eval()
        path = str(tmp_path / 'E0042.pth')
        torch.save({'state_dict': tm.state_dict(), 'optimizer': {},
                    'lr_schedular': {}}, path)

        variables = load_torch_checkpoint(path, P)
        fm = build_model(P)
        rng = np.random.default_rng(1)
        X = rng.random((2, 64, 64, 5), np.float32)
        with torch.no_grad():
            want = tm(torch.from_numpy(X.transpose(0, 3, 1, 2))).numpy()
        got = np.asarray(detect_axons(fm, variables, X)).reshape(2, -1)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_grouped_conv_and_deeper_fc(self):
        """groups>1 convs and multiple FCs convert correctly too."""
        P = get_default_parameters()
        P.update(dict(TILESIZE=32, ARCHITECTURE=[
            [(3, 8, 1, 1), 'M', (3, 8, 1, 2), 'M'],
            [('FC', 24), ('activation', 'sigmoid'),
             ('FC', 16), ('activation', 'sigmoid')],
        ]))
        tm = build_torch_reference_model(P)
        randomize(tm, seed=7)
        tm.eval()
        variables = torch_state_dict_to_flax(tm.state_dict(), P)
        fm = build_model(P)
        rng = np.random.default_rng(2)
        X = rng.random((2, 32, 32, 5), np.float32)
        with torch.no_grad():
            want = tm(torch.from_numpy(X.transpose(0, 3, 1, 2))).numpy()
        got = np.asarray(detect_axons(fm, variables, X)).reshape(2, -1)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
