"""Torch-FREE .pth reader (VERDICT r2 item 4).

Fabricates a REAL torch-format zip checkpoint — data.pkl assembled from raw
pickle opcodes (GLOBAL torch._utils._rebuild_tensor_v2, BINPERSID storage
references) plus little-endian storage blobs, the exact layout torch.save
emits (reference utils.py:258-263 saves {"state_dict": ...} this way) —
WITHOUT importing torch, then loads it through models.torch_convert.read_pth
and the public checkpoint API. tests/test_torch_convert.py separately
cross-checks the same reader against an actual torch.save when torch is
importable.
"""
import io
import struct
import zipfile

import numpy as np

from axtrack_tpu.models.torch_convert import (read_pth, load_torch_checkpoint,
                                              torch_state_dict_to_flax)
from axtrack_tpu.params import get_default_parameters


# --- minimal pickle-opcode emitter ----------------------------------------

def _glob(module, name):
    return b'c' + module.encode() + b'\n' + name.encode() + b'\n'


def _uni(s):
    b = s.encode('utf-8')
    return b'X' + struct.pack('<I', len(b)) + b


def _int(n):
    return b'J' + struct.pack('<i', int(n))


def _tup(*parts):
    return b'(' + b''.join(parts) + b't'


_STORAGE_CLS = {np.dtype(np.float32): 'FloatStorage',
                np.dtype(np.float64): 'DoubleStorage',
                np.dtype(np.int64): 'LongStorage'}


class _PthWriter:
    def __init__(self):
        self.storages = {}

    def tensor(self, arr, offset=0, size=None, stride=None, storage=None):
        """REDUCE(_rebuild_tensor_v2, (persid-storage, offset, size,
        stride, False, OrderedDict()))."""
        if storage is None:
            storage = arr
        size = arr.shape if size is None else size
        if stride is None:
            stride, acc = [], 1
            for s in reversed(size):
                stride.insert(0, acc)
                acc *= s
        key = str(len(self.storages))
        self.storages[key] = storage
        pid = _tup(_uni('storage'),
                   _glob('torch', _STORAGE_CLS[storage.dtype]),
                   _uni(key), _uni('cpu'), _int(storage.size))
        empty_od = _glob('collections', 'OrderedDict') + b')R'
        args = _tup(pid + b'Q', _int(offset),
                    _tup(*[_int(s) for s in size]),
                    _tup(*[_int(s) for s in stride]),
                    b'\x89', empty_od)
        return _glob('torch._utils', '_rebuild_tensor_v2') + args + b'R'

    def dict(self, d):
        b = b'}('
        for k, v in d.items():
            b += _uni(k)
            if isinstance(v, np.ndarray):
                b += self.tensor(v)
            elif isinstance(v, dict):
                b += self.dict(v)
            elif isinstance(v, bytes):      # pre-emitted opcodes
                b += v
            else:
                raise TypeError(type(v))
        return b + b'u'

    def write_zip(self, path, payload_ops):
        with zipfile.ZipFile(path, 'w') as zf:
            zf.writestr('archive/data.pkl',
                        b'\x80\x02' + payload_ops + b'.')
            zf.writestr('archive/version', '3\n')
            zf.writestr('archive/byteorder', 'little')
            for key, arr in self.storages.items():
                zf.writestr(f'archive/data/{key}',
                            np.ascontiguousarray(arr).tobytes())


def small_P():
    P = get_default_parameters()
    P.update(dict(TILESIZE=64, ARCHITECTURE=[
        [(3, 8, 2, 1), 'M', (3, 16, 1, 1), 'M'],
        [('FC', 32), ('activation', 'sigmoid')],
    ]))
    return P


def reference_state_dict(P, rng, in_c=5):
    """numpy state dict with the reference's names/shapes (model.py:87-117),
    including the num_batches_tracked int64 scalars torch BN emits."""
    sd = {}
    c = in_c
    for i, layer in enumerate(P['ARCHITECTURE'][0]):
        if layer == 'M':
            continue
        _, out_c, _, g = layer
        pre = f'ConvNet.ConvBlock_{i}'
        sd[f'{pre}.conv.weight'] = rng.normal(
            0, 0.3, (out_c, c // g, 3, 3)).astype(np.float32)
        sd[f'{pre}.conv.bias'] = rng.normal(0, 0.3, out_c).astype(np.float32)
        sd[f'{pre}.batchnorm.weight'] = rng.normal(
            1, 0.1, out_c).astype(np.float32)
        sd[f'{pre}.batchnorm.bias'] = rng.normal(
            0, 0.1, out_c).astype(np.float32)
        sd[f'{pre}.batchnorm.running_mean'] = rng.normal(
            0, 0.1, out_c).astype(np.float32)
        sd[f'{pre}.batchnorm.running_var'] = (
            rng.random(out_c) + 0.5).astype(np.float32)
        sd[f'{pre}.batchnorm.num_batches_tracked'] = np.array(7, np.int64)
        c = out_c
    n_feat = 8 * 8 * 16
    dims = [n_feat, 32, P['SY'] * P['SX'] * 3]
    for j, (d_in, d_out) in zip((1, 3), zip(dims, dims[1:])):
        sd[f'fcs.{j}.weight'] = rng.normal(
            0, 0.05, (d_out, d_in)).astype(np.float32)
        sd[f'fcs.{j}.bias'] = rng.normal(0, 0.05, d_out).astype(np.float32)
    return sd


class TestReadPth:
    def test_fabricated_zip_roundtrip(self, tmp_path):
        rng = np.random.default_rng(0)
        arrs = {'a.weight': rng.normal(size=(4, 3)).astype(np.float32),
                'a.count': np.array(5, np.int64),
                'nested': {'b': rng.normal(size=(2, 2, 2)).astype(np.float32)}}
        w = _PthWriter()
        path = str(tmp_path / 'E0001.pth')
        w.write_zip(path, w.dict(arrs))
        got = read_pth(path)
        np.testing.assert_array_equal(got['a.weight'], arrs['a.weight'])
        assert got['a.count'] == 5
        np.testing.assert_array_equal(got['nested']['b'], arrs['nested']['b'])

    def test_strided_view_tensor(self, tmp_path):
        """Tensors saved as non-contiguous views (offset + strides into a
        bigger storage) rebuild correctly."""
        storage = np.arange(24, dtype=np.float32)
        w = _PthWriter()
        ops = b'}(' + _uni('v') + w.tensor(
            None, offset=2, size=(2, 3), stride=(10, 2),
            storage=storage) + b'u'
        path = str(tmp_path / 'view.pth')
        w.write_zip(path, ops)
        got = read_pth(path)['v']
        want = np.lib.stride_tricks.as_strided(
            storage[2:], (2, 3), (40, 8)).copy()
        np.testing.assert_array_equal(got, want)

    def test_reference_checkpoint_through_public_api(self, tmp_path):
        """A fabricated reference-format E1000.pth in a bundle directory
        loads through the public checkpoint API (engine setup path) and
        matches torch_state_dict_to_flax on the same arrays."""
        P = small_P()
        rng = np.random.default_rng(3)
        sd = reference_state_dict(P, rng)
        w = _PthWriter()
        payload = w.dict({'state_dict': sd, 'optimizer': {},
                          'lr_schedular': {}})
        path = str(tmp_path / 'E1000.pth')
        w.write_zip(path, payload)

        want = torch_state_dict_to_flax(sd, P)
        got = load_torch_checkpoint(path, P)
        for tree_w, tree_g in ((want['params'], got['params']),
                               (want['batch_stats'], got['batch_stats'])):
            import jax
            jax.tree.map(np.testing.assert_array_equal, tree_g, tree_w)

        # directory form: load_checkpoint finds E*.pth in a bundle dir
        from axtrack_tpu.train import engine
        P2 = dict(P, LOAD_MODEL=str(tmp_path))
        state = engine.setup_model(P2)
        import jax
        jax.tree.map(np.testing.assert_array_equal,
                     jax.tree.map(np.asarray, state.params), want['params'])
