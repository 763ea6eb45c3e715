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


def _np(t):
    return np.asarray(t.detach().cpu().numpy()
                      if hasattr(t, 'detach') else t, np.float32)


def torch_state_dict_to_flax(state_dict, P):
    """Map a reference-format torch state dict (plain dict of arrays; torch
    tensors and numpy both accepted) onto flax variables.

    Args:
      state_dict: dict of 'ConvNet.ConvBlock_i...' / 'fcs.j...' arrays
        (custom ARCHITECTURE spec), or 'ConvNet.block_i...' / 'fcs.j...'
        when ARCHITECTURE is a backbone string (reference model.py:55-83
        wraps the torchvision stack as ConvNet.block_{i}).
      P: the parameter dict (ARCHITECTURE, TILESIZE must match the
        checkpoint).

    Returns {'params': ..., 'batch_stats': ...} for YOLOAxTrack.apply.
    """
    def get(name):
        return _np(state_dict[name])

    if isinstance(P['ARCHITECTURE'], str):
        return _backbone_checkpoint_to_flax(state_dict, P)

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
# Backbone-architecture conversion (ARCHITECTURE in 'mobilenet'/'alexnet'/
# 'resnet'): maps torch state dicts onto models/backbones.py's exact flax
# ports of the reference-modified torchvision stacks. Two input flavors:
#   - reference-wrapped keys 'ConvNet.block_{i}....' (+ 'fcs.{j}....')
#   - raw torchvision keys 'features.{i}....' (alexnet/mobilenet) or
#     'conv1/bn1/layer{k}....' (resnet18) — bring-your-own pretrained
#     weights; the replaced first conv (different in_channels) and the
#     missing FC head stay at their current (random) initialization.
# ---------------------------------------------------------------------------


def _conv_w(t):
    return _np(t).transpose(2, 3, 1, 0)        # [out,in/g,kh,kw]->[kh,kw,in/g,out]


def _normalize_backbone_keys(state_dict, which):
    """Canonicalize to 'block_{i}.<tail>' (+ passthrough 'fcs.*')."""
    out = {}
    for k, v in state_dict.items():
        k2 = k[len('ConvNet.'):] if k.startswith('ConvNet.') else k
        if k2.startswith('features.'):
            i, _, tail = k2[len('features.'):].partition('.')
            k2 = f'block_{i}.{tail}'
        elif which == 'resnet':
            if k2.startswith('conv1.'):
                k2 = 'block_0.' + k2[len('conv1.'):]
            elif k2.startswith('bn1.'):
                k2 = 'block_1.' + k2[len('bn1.'):]
            elif k2.startswith('layer'):
                n, _, tail = k2[len('layer'):].partition('.')
                k2 = f'block_{3 + int(n)}.{tail}'
        out[k2] = v
    return out


def _take_bn(sd, prefix, params, stats, name, missing):
    keys = [f'{prefix}.weight', f'{prefix}.bias',
            f'{prefix}.running_mean', f'{prefix}.running_var']
    if not all(k in sd for k in keys):
        missing.append(prefix)
        return
    params[name] = {'scale': _np(sd[keys[0]]), 'bias': _np(sd[keys[1]])}
    stats[name] = {'mean': _np(sd[keys[2]]), 'var': _np(sd[keys[3]])}


def _take_conv(sd, prefix, params, name, missing, bias=True):
    if f'{prefix}.weight' not in sd:
        missing.append(prefix)
        return
    p = {'kernel': _conv_w(sd[f'{prefix}.weight'])}
    if bias and f'{prefix}.bias' in sd:
        p['bias'] = _np(sd[f'{prefix}.bias'])
    params[name] = p


def _map_backbone(sd, which):
    """Canonical-key torch dict -> (params, batch_stats, missing) for the
    'backbone' flax subtree. Missing entries (e.g. a raw torchvision dict's
    incompatible stem) are reported, not fatal."""
    params, stats, missing = {}, {}, []
    if which == 'alexnet':
        for i in (0, 3, 6, 8, 10):
            _take_conv(sd, f'block_{i}', params, f'block_{i}', missing)
    elif which == 'resnet':
        _take_conv(sd, 'block_0', params, 'block_0', missing)
        _take_bn(sd, 'block_1', params, stats, 'block_1', missing)
        for k in range(4):
            for j in range(2):
                pre = f'block_{4 + k}.{j}'
                name = f'block_{4 + k}_{j}'
                sub_p, sub_s = {}, {}
                _take_conv(sd, f'{pre}.conv1', sub_p, 'conv1', missing,
                           bias=False)
                _take_bn(sd, f'{pre}.bn1', sub_p, sub_s, 'bn1', missing)
                _take_conv(sd, f'{pre}.conv2', sub_p, 'conv2', missing,
                           bias=False)
                _take_bn(sd, f'{pre}.bn2', sub_p, sub_s, 'bn2', missing)
                if f'{pre}.downsample.0.weight' in sd:
                    _take_conv(sd, f'{pre}.downsample.0', sub_p, 'ds_conv',
                               missing, bias=False)
                    _take_bn(sd, f'{pre}.downsample.1', sub_p, sub_s,
                             'ds_bn', missing)
                if sub_p:
                    params[name] = sub_p
                if sub_s:
                    stats[name] = sub_s
    elif which == 'mobilenet':
        from .backbones import MOBILENET_V3_SMALL_CONF
        _take_conv(sd, 'block_0', params, 'block_0', missing)
        for i, (in_c, _, exp_c, _, use_se, _, _) in enumerate(
                MOBILENET_V3_SMALL_CONF):
            pre = f'block_{i + 1}.block'
            parts = (['expand'] if exp_c != in_c else []) + ['dw'] \
                + (['se'] if use_se else []) + ['project']
            sub_p, sub_s = {}, {}
            for j, part in enumerate(parts):
                if part == 'se':
                    se_p = {}
                    _take_conv(sd, f'{pre}.{j}.fc1', se_p, 'fc1', missing)
                    _take_conv(sd, f'{pre}.{j}.fc2', se_p, 'fc2', missing)
                    if se_p:
                        sub_p['se'] = se_p
                else:                    # Conv2dNormActivation: .0 conv .1 bn
                    cna_p, cna_s = {}, {}
                    _take_conv(sd, f'{pre}.{j}.0', cna_p, 'conv', missing,
                               bias=False)
                    _take_bn(sd, f'{pre}.{j}.1', cna_p, cna_s, 'bn', missing)
                    if cna_p:
                        sub_p[part] = cna_p
                    if cna_s:
                        sub_s[part] = cna_s
            if sub_p:
                params[f'block_{i + 1}'] = sub_p
            if sub_s:
                stats[f'block_{i + 1}'] = sub_s
        cna_p, cna_s = {}, {}
        _take_conv(sd, 'block_12.0', cna_p, 'conv', missing, bias=False)
        _take_bn(sd, 'block_12.1', cna_p, cna_s, 'bn', missing)
        if cna_p:
            params['block_12'] = cna_p
        if cna_s:
            stats['block_12'] = cna_s
    else:
        raise ValueError(f'unknown backbone {which!r}')
    return params, stats, missing


def _backbone_checkpoint_to_flax(state_dict, P):
    """Full reference-format checkpoint (ConvNet.block_* + fcs.*) for a
    string ARCHITECTURE -> flax variables (strict: raises on missing conv
    layers; the FC head must be present)."""
    from .backbones import BACKBONES
    which = P['ARCHITECTURE']
    sd = _normalize_backbone_keys(state_dict, which)
    conv_params, conv_stats, missing = _map_backbone(sd, which)
    if missing:
        raise KeyError(f'backbone checkpoint incomplete, missing: {missing}')
    params = {'backbone': conv_params}
    batch_stats = {'backbone': conv_stats} if conv_stats else {}

    fc_spec = [('FC', 1024), ('activation', 'sigmoid'),
               ('FC', 1024), ('activation', 'sigmoid')]
    torch_linears = [1 + j for j, (et, _) in enumerate(fc_spec)
                     if et == 'FC'] + [1 + len(fc_spec)]
    H, W, C = BACKBONES[which].out_hw(P['TILESIZE'])
    perm = _nchw_to_nhwc_flat_perm(C, H, W)
    for m, j in enumerate(torch_linears):
        kernel = _np(sd[f'fcs.{j}.weight']).T
        if m == 0:
            assert kernel.shape[0] == H * W * C, \
                (kernel.shape, (H, W, C), 'backbone/TILESIZE mismatch')
            kernel = kernel[perm]
        params[f'Dense_{m}'] = {'kernel': kernel,
                                'bias': _np(sd[f'fcs.{j}.bias'])}
    return {'params': params, 'batch_stats': batch_stats}


def backbone_state_dict_to_flax(state_dict, which, P, variables):
    """Merge a RAW torchvision backbone state dict (e.g. an exported
    ``mobilenet_v3_small(weights=...).state_dict()``) onto existing flax
    variables — the reference's ``_from_pretrained`` splice (model.py:55-83):
    every pretrained layer loads; the replaced first conv (torchvision's has
    3 input channels, ours initial_in_channels) and the FC head keep their
    current initialization.

    Returns (variables, loaded_names, skipped) where skipped lists layers
    left at their prior values (shape-incompatible or absent).
    """
    sd = _normalize_backbone_keys(state_dict, which)
    conv_params, conv_stats, missing = _map_backbone(sd, which)
    import jax
    params = jax.tree_util.tree_map(np.asarray, variables['params'])
    stats = jax.tree_util.tree_map(np.asarray,
                                   variables.get('batch_stats', {}))
    loaded, skipped = [], list(missing)

    def merge(dst, src, path):
        for k, v in src.items():
            if isinstance(v, dict):
                if k in dst:
                    merge(dst[k], v, f'{path}/{k}')
                else:
                    skipped.append(f'{path}/{k}')
            elif k in dst and dst[k].shape == v.shape:
                dst[k] = v
                loaded.append(f'{path}/{k}')
            else:
                skipped.append(f'{path}/{k}')

    merge(params['backbone'], conv_params, 'backbone')
    if conv_stats:
        merge(stats['backbone'], conv_stats, 'backbone')
    out = {'params': params}
    if stats:
        out['batch_stats'] = stats
    return out, loaded, skipped


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
