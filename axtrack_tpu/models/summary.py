"""Model summary utilities.

Counterpart of the reference's torchsummary usage + print_torchvision_models
(reference utils.py:290-308): per-layer parameter counts + output shapes for
a flax model, and a comparison table over the built-in backbone stacks.
"""
import numpy as np
import jax
import jax.numpy as jnp

from .yolo import build_model, init_variables, initial_in_channels


def model_summary(model, variables, input_shape):
    """Per-layer parameter counts + total (torchsummary-style)."""
    lines = [f'{"layer":36} {"params":>12}']
    total = 0
    import jax.tree_util as jtu
    by_layer = {}
    for path, leaf in jtu.tree_flatten_with_path(variables['params'])[0]:
        names = [str(getattr(p, 'key', p)) for p in path]
        layer = names[0]
        by_layer.setdefault(layer, 0)
        by_layer[layer] += int(np.prod(leaf.shape))
    for layer, n in by_layer.items():
        lines.append(f'{layer:36} {n:12,}')
        total += n
    lines.append(f'{"TOTAL":36} {total:12,}')
    x = jnp.zeros((1, *input_shape), jnp.float32)
    out = model.apply(variables, x, train=False)
    lines.append(f'input {tuple(x.shape)} -> output {tuple(out.shape)}')
    return '\n'.join(lines)


def print_backbone_models(params=None, tilesize=None):
    """Summaries of the built-in backbone stacks (reference
    utils.py:290-308 printed torchvision models)."""
    from ..params import get_default_parameters
    P = dict(params or get_default_parameters())
    if tilesize:
        P['TILESIZE'] = tilesize
    c = initial_in_channels(P)
    for arch in ('alexnet', 'mobilenet', 'resnet', None):
        P2 = dict(P)
        if arch is not None:
            P2['ARCHITECTURE'] = arch
        name = arch or 'default (ARCHITECTURE spec)'
        print(f'\n=== {name} ===')
        model = build_model(P2)
        variables = init_variables(model, P2, seed=0)
        print(model_summary(model, variables,
                            (P2['TILESIZE'], P2['TILESIZE'], c)))
