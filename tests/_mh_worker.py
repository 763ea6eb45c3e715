"""Worker process for the two-process multi-host test (test_multihost2.py).

Run as: python _mh_worker.py <coordinator host:port> <world_size> <rank>

Each process owns 4 virtual CPU devices; the global ('data', 'model') mesh
spans both processes with the tensor-parallel axis kept process-local (the
ICI analog) and the data axis spanning processes (the DCN analog). Checks
the real multi-host mechanics the degenerate single-process test cannot:
rendezvous, cross-process gloo collectives, global-array construction from
per-process shards, and one sharded train step with identical replicated
loss on every rank.
"""
import os
import sys

coord, world, rank = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
os.environ['JAX_PLATFORMS'] = 'cpu'
os.environ['XLA_FLAGS'] = '--xla_force_host_platform_device_count=4'
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
# gloo CPU collectives are selected by init_distributed itself

from axtrack_tpu.parallel.multihost import (init_distributed,  # noqa: E402
                                            make_global_mesh)

n, i = init_distributed(coord, world, rank)
assert (n, i) == (world, rank), (n, i)

import numpy as np  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from axtrack_tpu.params import get_default_parameters  # noqa: E402
from axtrack_tpu.train import engine  # noqa: E402
from axtrack_tpu.parallel import mesh as M  # noqa: E402

mesh = make_global_mesh(n_model=2)
assert mesh.shape['model'] == 2
assert mesh.shape['data'] * 2 == len(jax.devices())

# 1) cross-process collective: global sum over a dp-sharded array
local = np.arange(8, dtype=np.float32) + 100 * rank
g = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P('data')), local)
s = jax.jit(lambda x: x.sum(), out_shardings=NamedSharding(mesh, P()))(g)
val = float(np.asarray(jax.device_get(s.addressable_shards[0].data)))
want = sum(float(np.arange(8).sum() + 100 * 8 * r) for r in range(world))
assert val == want, (val, want)

# 2) one sharded train step: dp batch spans processes, tp within each
Pm = get_default_parameters()
Pm.update(dict(BATCH_SIZE=8, TILESIZE=64, ARCHITECTURE=[
    [(3, 8, 2, 1), (3, 16, 2, 1), 'M', (3, 16, 1, 1), 'M'],
    [('FC', 64), ('activation', 'sigmoid')],
]))
state = engine.setup_model(Pm)
state = M.distribute_state(state, mesh)
train_step, _ = engine.make_train_step(state.model, state.tx, Pm)
B = Pm['BATCH_SIZE']
rng = np.random.default_rng(0)                 # same draw on every rank
X_host = rng.random((B, 64, 64, 5), np.float32)
tgt_host = np.zeros((B, Pm['SX'], Pm['SY'], 4), np.float32)
rows = B // world
lo = rank * rows
Xg = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P('data')), X_host[lo:lo + rows])
Tg = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P('data')), tgt_host[lo:lo + rows])
params, bs, opt, loss, comps = train_step(
    state.params, state.batch_stats, state.opt_state, Xg, Tg)
jax.block_until_ready(params)
lv = float(np.asarray(jax.device_get(loss.addressable_shards[0].data)))
print(f'MH_OK rank={rank} loss={lv:.6f}', flush=True)
