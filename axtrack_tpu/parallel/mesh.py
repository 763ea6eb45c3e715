"""Device-mesh parallelism.

The reference is strictly single-process (SURVEY.md §2.3: no
torch.distributed/NCCL anywhere — its only concurrency is a DataLoader and
an A* thread pool). This module is the TPU-native replacement layer: a
``jax.sharding.Mesh`` over ICI with named axes

  - ``data``  : batch/data parallelism over tiles (training) or frames
                (inference). Spatial tiling of the 2920x6364 frames makes
                tiles the natural data-parallel unit, so 'data' doubles as
                spatial parallelism.
  - ``model`` : tensor parallelism over the detector's FC head (the 42M-
                parameter Dense layers dominate; column-parallel first FC,
                row-parallel second, XLA inserts the psum on ICI).

Pipeline/expert parallelism are not meaningful for this model family (a
9-layer CNN + 2 FC, no experts); depth is too small to beat the bubble. The
mesh axes here are the ones that pay: dp over tiles/frames/movies, tp over
the FC head.

Shardings are expressed as NamedSharding annotations on the param/batch
pytrees; collectives are inserted by XLA (scaling-book recipe: pick a mesh,
annotate, let the compiler place psum/all-gather on ICI).
"""
import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data=None, n_model=None, devices=None):
    """Build a ('data', 'model') mesh over the available devices."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if n_model is None:
        n_model = 2 if n % 2 == 0 and n > 1 else 1
    if n_data is None:
        n_data = n // n_model
    dev_array = np.asarray(devices[:n_data * n_model]).reshape(
        n_data, n_model)
    return Mesh(dev_array, ('data', 'model'))


def _path_names(path):
    return [str(getattr(p, 'key', getattr(p, 'name', p))) for p in path]


def _dense_name(path):
    """The Dense module component of a param path, or None."""
    for n in _path_names(path):
        if n.startswith('Dense'):
            return n
    return None


def _dense_order(params):
    """Dense module names in definition order (flax numbers them
    Dense_0, Dense_1, ...; sorting by the numeric suffix is robust to
    convs/BN interspersed in the tree and to missing indices)."""
    names = set()

    def collect(path, leaf):
        n = _dense_name(path)
        if n is not None:
            names.add(n)
        return leaf

    jax.tree_util.tree_map_with_path(collect, params)

    def key(n):
        tail = n.rsplit('_', 1)[-1]
        return (int(tail) if tail.isdigit() else -1, n)

    return sorted(names, key=key)


def param_partition_spec(path, leaf, dense_order=()):
    """PartitionSpec for one model parameter.

    Conv kernels/biases + BatchNorm: replicated (small). The FC stack is
    Megatron tensor-parallel over 'model': the hidden Dense layers
    alternate column-parallel / row-parallel (so consecutive FCs chain
    without resharding), and the FINAL Dense — the small Sy*Sx*3 output
    head — is replicated. ``dense_order`` is the model's Dense module
    names in definition order (see _dense_order); position in that list,
    not the raw flax index parity, decides the layout.
    """
    name = _dense_name(path)
    if name is None or name not in dense_order or leaf.ndim < 1:
        return P()
    pos = dense_order.index(name)
    if pos == len(dense_order) - 1:
        return P()                            # output head: replicated
    if leaf.ndim == 2 and min(leaf.shape) >= 2:
        if pos % 2 == 0:
            return P(None, 'model')           # column parallel
        return P('model', None)               # row parallel
    if leaf.ndim == 1 and pos % 2 == 0 and leaf.shape[0] >= 2:
        return P('model')                     # column-parallel bias
    return P()


def shard_params(params, mesh):
    """device_put a param pytree with TP shardings over the mesh."""
    dense_order = _dense_order(params)

    def place(path, leaf):
        spec = param_partition_spec(path, leaf, dense_order)
        # only shard when divisible; else replicate
        for ax_name, dim in zip(spec, leaf.shape):
            if ax_name is not None and dim % mesh.shape[ax_name] != 0:
                spec = P()
                break
        return jax.device_put(leaf, NamedSharding(mesh, spec))
    return jax.tree_util.tree_map_with_path(place, params)


def replicate(tree, mesh):
    return jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), tree)


def shard_batch(batch, mesh):
    """Shard leading (batch) dim over 'data'."""
    return jax.tree.map(
        lambda x: jax.device_put(
            jnp.asarray(x), NamedSharding(mesh, P('data'))), batch)


def dp_constrain(x, mesh):
    """Constrain the leading (batch) dim of ``x`` onto the 'data' axis —
    the annotation that turns the engine's epoch scan into data-parallel
    compute (XLA psums the grads where they meet the replicated params).
    No-op when the dim doesn't divide (e.g. remainder batches) or no mesh
    is given, so call sites stay unconditional.

    Why this guards divisibility while frames_constrain below does not:
    GSPMD would happily pad a remainder BATCH too, but a padded batch
    changes training semantics (the pad rows would enter the loss mean),
    so remainder batches stay unsharded; frames_constrain's per-frame
    prep work is independent per frame and pad frames are never gathered,
    so it can rely on GSPMD padding."""
    if mesh is None or x.shape[0] % mesh.shape['data']:
        return x
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P('data')))


def frames_constrain(x, mesh):
    """Constrain the leading (frame) dim over 'data' — annotates the chunk
    prep chain (staged u16 preproc -> augment transform -> tiling) so XLA
    partitions the per-frame work, rotation gather included, across the
    'data' chips instead of replicating it (train/bigmovie.py run_chunk).
    Frames are independent through that whole chain; non-divisible frame
    counts are fine (GSPMD pads the last shard)."""
    if mesh is None:
        return x
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P('data', *([None] * (x.ndim - 1)))))


def replicate_constrain(x, mesh):
    """Constrain ``x`` fully replicated — placed after the kept-tile gather
    it makes XLA all-gather the chunk's tiles ONCE (over ICI) before the
    batch scan, instead of re-gathering per scan step."""
    if mesh is None:
        return x
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, P()))


def replicate_put(tree, mesh):
    """device_put a pytree fully replicated on the mesh; identity without a
    mesh. Inputs that stay committed to one device would clash with
    mesh-sharded params inside a jit ('incompatible devices')."""
    if mesh is None:
        return tree
    return jax.tree.map(
        lambda x: jax.device_put(jnp.asarray(x), NamedSharding(mesh, P())),
        tree)


def sharded_inference_fn(model, variables, mesh):
    """Batched tile inference with tiles sharded over 'data' and the FC head
    over 'model'."""
    from ..models.yolo import detect_axons

    @jax.jit
    def fn(X):
        X = jax.lax.with_sharding_constraint(
            X, NamedSharding(mesh, P('data')))
        return detect_axons(model, variables, X)
    return fn


def distribute_state(state, mesh):
    """Place a TrainState on the mesh: params TP-sharded, batch stats
    replicated, optimizer state re-initialized on the sharded params (Adam
    moments are zeros_like(param) and inherit the param shardings — note
    this resets moments, so distribute before training, not mid-run).

    Also records the mesh on the state: the training engine
    (engine.run_epoch_device / bigmovie.run_epoch_chunked) reads
    ``state.mesh`` to shard every epoch's batch axis over 'data' and place
    epoch inputs on the mesh — this is how ``run_experiment(mesh=...)``
    trains multi-chip."""
    state.params = shard_params(state.params, mesh)
    state.batch_stats = replicate(state.batch_stats, mesh)
    state.opt_state = state.tx.init(state.params)
    state.mesh = mesh
    return state
