"""torch -> flax checkpoint converter for the YOLO_AXTrack detector.

The reference trains/ships torch checkpoints (utils.py:258-263 wraps the
model state_dict as {"state_dict": ..., "optimizer": ..., "lr_schedular":
...}; deployed_model/E1000.pth is such a file, LFS-stripped in the
snapshot). This module maps that state dict onto the flax param tree of
models/yolo.YOLOAxTrack so true weight parity is one call away whenever a
reference checkpoint (or pretrained torchvision backbone spliced the
reference's way, model.py:55-83) materializes.

Key layout of the reference custom architecture (model.py:87-117):
  ConvNet.ConvBlock_{i}.conv.{weight,bias}           i counts conv AND 'M'
  ConvNet.ConvBlock_{i}.batchnorm.{weight,bias,running_mean,running_var}
  fcs.{j}.{weight,bias}                              j over the Sequential
                                                     (0 = Flatten)
Flax layout (models/yolo.YOLOAxTrack, @nn.compact auto-naming):
  params/CNNBlock_{k}/Conv_0/{kernel,bias}           k counts convs only
  params/CNNBlock_{k}/BatchNorm_0/{scale,bias}
  batch_stats/CNNBlock_{k}/BatchNorm_0/{mean,var}
  params/Dense_{m}/{kernel,bias}

Layout conversions:
  - conv weight  [out, in/groups, kh, kw] -> [kh, kw, in/groups, out]
  - linear weight [out, in] -> [in, out]
  - the FIRST linear consumes the flattened conv features, and torch
    flattens NCHW (index c*H*W + h*W + w) while flax flattens NHWC
    (index h*W*C + w*C + c): its input rows are permuted accordingly.

A torch-FREE ``.pth`` reader (``read_pth``) makes the conversion path
executable without torch installed: torch's zip container is just
data.pkl + raw storage blobs (see reader docstring).
"""
import pickle
import zipfile

import numpy as np


def _conv_out_hw(conv_spec, tilesize):
    """(H, W, C) of the conv stack output, from the ARCHITECTURE spec
    (padding is always (1,1) in the reference's custom stack)."""
    h = w = tilesize
    c = None
    for layer in conv_spec:
        if layer == 'M':
            h //= 2
            w //= 2
        else:
            k, out_c, stride, _ = layer
            h = (h + 2 - k) // stride + 1
            w = (w + 2 - k) // stride + 1
            c = out_c
    return h, w, c


def _nchw_to_nhwc_flat_perm(C, H, W):
    """perm such that flax_rows[perm] receive torch rows: for flax flat
    index f = h*W*C + w*C + c, perm[f] = c*H*W + h*W + w."""
    hh, ww, cc = np.meshgrid(np.arange(H), np.arange(W), np.arange(C),
                             indexing='ij')
    return (cc * H * W + hh * W + ww).reshape(-1)


def torch_state_dict_to_flax(state_dict, P):
    """Map a reference-format torch state dict (plain dict of arrays; torch
    tensors and numpy both accepted) onto flax variables.

    Args:
      state_dict: dict of 'ConvNet.ConvBlock_i...' / 'fcs.j...' arrays.
      P: the parameter dict (ARCHITECTURE, TILESIZE must match the
        checkpoint).

    Returns {'params': ..., 'batch_stats': ...} for YOLOAxTrack.apply.
    """
    def get(name):
        t = state_dict[name]
        return np.asarray(t.detach().cpu().numpy()
                          if hasattr(t, 'detach') else t, np.float32)

    conv_spec, fc_spec = P['ARCHITECTURE'][0], P['ARCHITECTURE'][1]
    params, batch_stats = {}, {}

    k = 0                                        # flax CNNBlock counter
    for i, layer in enumerate(conv_spec):        # i: torch ConvBlock index
        if layer == 'M':
            continue
        pre = f'ConvNet.ConvBlock_{i}'
        params[f'CNNBlock_{k}'] = {
            'Conv_0': {
                'kernel': get(f'{pre}.conv.weight').transpose(2, 3, 1, 0),
                'bias': get(f'{pre}.conv.bias')},
            'BatchNorm_0': {
                'scale': get(f'{pre}.batchnorm.weight'),
                'bias': get(f'{pre}.batchnorm.bias')},
        }
        batch_stats[f'CNNBlock_{k}'] = {'BatchNorm_0': {
            'mean': get(f'{pre}.batchnorm.running_mean'),
            'var': get(f'{pre}.batchnorm.running_var')}}
        k += 1

    # torch fcs Sequential indices that are Linear: Flatten is 0, then one
    # module per fc_spec element, head appended last (model.py:105-117)
    torch_linears = [1 + j for j, (et, _) in enumerate(fc_spec)
                     if et == 'FC'] + [1 + len(fc_spec)]
    H, W, C = _conv_out_hw(conv_spec, P['TILESIZE'])
    perm = _nchw_to_nhwc_flat_perm(C, H, W)
    for m, j in enumerate(torch_linears):
        kernel = get(f'fcs.{j}.weight').T        # [in, out]
        if m == 0:
            assert kernel.shape[0] == H * W * C, \
                (kernel.shape, (H, W, C), 'ARCHITECTURE/TILESIZE mismatch')
            kernel = kernel[perm]                # NCHW -> NHWC flatten order
        params[f'Dense_{m}'] = {'kernel': kernel,
                                'bias': get(f'fcs.{j}.bias')}

    import jax
    to_jnp = lambda t: jax.tree.map(lambda a: np.asarray(a), t)  # noqa: E731
    return {'params': to_jnp(params), 'batch_stats': to_jnp(batch_stats)}


# ---------------------------------------------------------------------------
# torch-free .pth reader (VERDICT r2 item 4)
#
# torch.save's zip format: <name>/data.pkl (pickle with persistent IDs
# ('storage', <TypedStorage class>, key, location, numel)) plus raw little-
# endian storage blobs at <name>/data/<key>. Reading it needs only zipfile +
# a pickle.Unpickler subclass — no torch — so the reference-checkpoint
# parity path is executable in torch-less environments too.
# ---------------------------------------------------------------------------

_STORAGE_DTYPES = {
    'FloatStorage': np.float32, 'DoubleStorage': np.float64,
    'HalfStorage': np.float16, 'LongStorage': np.int64,
    'IntStorage': np.int32, 'ShortStorage': np.int16,
    'CharStorage': np.int8, 'ByteStorage': np.uint8,
    'BoolStorage': np.bool_,
}


def _rebuild_tensor_np(storage, storage_offset, size, stride, *unused):
    """numpy stand-in for torch._utils._rebuild_tensor_v2."""
    arr = storage
    if len(size) == 0:
        return arr[storage_offset].copy()
    strides = tuple(s * arr.itemsize for s in stride)
    view = np.lib.stride_tricks.as_strided(
        arr[storage_offset:], shape=tuple(size), strides=strides)
    return view.copy()


class _PthUnpickler(pickle.Unpickler):
    def __init__(self, file, read_storage):
        super().__init__(file, encoding='latin1')
        self._read_storage = read_storage

    def find_class(self, module, name):
        if module == 'torch._utils' and name in (
                '_rebuild_tensor_v2', '_rebuild_tensor'):
            return _rebuild_tensor_np
        if module == 'torch._utils' and name == '_rebuild_parameter':
            return lambda tensor, *a: tensor
        if module == 'torch' and name in _STORAGE_DTYPES:
            return _STORAGE_DTYPES[name]
        if module == 'torch' and name == 'BFloat16Storage':
            import ml_dtypes
            return np.dtype(ml_dtypes.bfloat16)
        if module in ('collections', 'numpy', 'numpy.core.multiarray',
                      'numpy._core.multiarray'):
            return super().find_class(module, name)
        if module.startswith('torch'):
            # inert placeholder for anything else torch-flavored (devices,
            # dtypes riding in optimizer/scheduler state): callable and
            # hashable, never used by the converter
            return lambda *a, **k: None
        return super().find_class(module, name)

    def persistent_load(self, pid):
        kind, dtype, key, _location, numel = pid
        assert kind == 'storage', pid
        return self._read_storage(key, np.dtype(dtype), numel)


def read_pth(path):
    """Parse a torch-format zip checkpoint into plain numpy containers
    (dicts/lists/np.ndarrays), without importing torch."""
    with zipfile.ZipFile(path) as zf:
        pkl_names = [n for n in zf.namelist() if n.endswith('/data.pkl')]
        if not pkl_names:
            raise ValueError(
                f'{path}: not a torch zip checkpoint (no data.pkl); '
                'legacy (pre-1.6) tar-format saves are not supported')
        prefix = pkl_names[0][:-len('data.pkl')]

        def read_storage(key, dtype, numel):
            buf = zf.read(f'{prefix}data/{key}')
            a = np.frombuffer(buf, dtype=dtype, count=numel)
            return a

        with zf.open(pkl_names[0]) as f:
            return _PthUnpickler(f, read_storage).load()


def load_torch_checkpoint(path, P):
    """Load a reference E{epoch}.pth (torch.save of {"state_dict": ...,
    "optimizer": ..., "lr_schedular": ...}, reference utils.py:258-263) and
    convert to flax variables. Accepts a bare state dict too. Torch-free:
    uses the zip+pickle reader above (parity vs torch.load is tested when
    torch is importable)."""
    ckpt = read_pth(path)
    state_dict = ckpt.get('state_dict', ckpt) if isinstance(ckpt, dict) \
        else ckpt
    return torch_state_dict_to_flax(state_dict, P)
