"""Parallel-layer tests on the 8-virtual-device CPU mesh."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from axtrack_tpu.params import get_default_parameters
from axtrack_tpu.parallel import mesh as M
from axtrack_tpu.parallel.movies import batched_movie_detector, shard_movies
from axtrack_tpu.models.yolo import build_model, init_variables
from axtrack_tpu.ops import tiling as TL
from axtrack_tpu.train import engine


@pytest.fixture(scope='module')
def small_P():
    P = get_default_parameters()
    P.update(dict(TILESIZE=64, BATCH_SIZE=8, ARCHITECTURE=[
        [(3, 8, 2, 1), (3, 16, 2, 1), 'M', (3, 16, 1, 1), 'M'],
        [('FC', 64), ('activation', 'sigmoid'),
         ('FC', 64), ('activation', 'sigmoid')]]))
    return P


class TestMesh:
    def test_make_mesh_shapes(self):
        m = M.make_mesh()
        assert dict(m.shape) == {'data': 4, 'model': 2}
        m1 = M.make_mesh(n_data=8, n_model=1)
        assert dict(m1.shape) == {'data': 8, 'model': 1}

    def test_tp_param_shardings(self, small_P):
        m = M.make_mesh()
        state = engine.setup_model(small_P)
        state = M.distribute_state(state, m)
        from jax.sharding import PartitionSpec as P
        kernels = {}
        import jax.tree_util as jtu
        for path, leaf in jtu.tree_flatten_with_path(state.params)[0]:
            n = '/'.join(str(getattr(p, 'key', p)) for p in path)
            if 'Dense' in n and 'kernel' in n:
                kernels[n] = leaf.sharding.spec
        assert kernels['Dense_0/kernel'] == P(None, 'model')
        assert kernels['Dense_1/kernel'] == P('model', None)

    def test_sharded_train_step_runs(self, small_P):
        m = M.make_mesh()
        state = engine.setup_model(small_P)
        state = M.distribute_state(state, m)
        step, _ = engine.make_train_step(state.model, state.tx, small_P)
        X = M.shard_batch(jnp.zeros((8, 64, 64, 5)), m)
        tgt = M.shard_batch(jnp.zeros((8, 12, 12, 4)), m)
        params, bs, opt, loss, comps = step(state.params, state.batch_stats,
                                            state.opt_state, X, tgt)
        assert np.isfinite(float(loss))
        # params keep their TP sharding through the update
        import jax.tree_util as jtu
        for path, leaf in jtu.tree_flatten_with_path(params)[0]:
            n = '/'.join(str(getattr(p, 'key', p)) for p in path)
            if n == 'Dense_0/kernel':
                assert 'model' in str(leaf.sharding.spec)


class TestMultiMovie:
    def test_batched_movies_sharded(self, small_P):
        mesh = M.make_mesh(n_data=4, n_model=2)
        P = small_P
        model = build_model(P)
        variables = init_variables(model, P, seed=0)
        Mv, T_all, H, W = 4, 8, 128, 128
        rng = np.random.default_rng(0)
        movies = (rng.random((Mv, T_all, H, W)) * 65535).astype(np.uint16)
        mask = np.ones((H, W), bool)
        ny, nx = TL.n_tiles(H, 64), TL.n_tiles(W, 64)
        keep = np.ones((ny, nx), bool)
        flat, tyx = TL.tile_index_table(keep)
        fn = batched_movie_detector(model, variables, mesh, P,
                                    n_frames=4, tile_flat_idx=flat,
                                    tile_yx=tyx, max_dets=32)
        movies_d = shard_movies(movies, mesh)
        conf, x, y, alive = fn(movies_d, jnp.asarray(mask))
        assert conf.shape == (Mv, 4, 32)
        assert alive.shape == (Mv, 4, 32)
        # movie axis sharded over 'data'
        assert 'data' in str(conf.sharding.spec) or \
            conf.sharding.is_fully_replicated is False
