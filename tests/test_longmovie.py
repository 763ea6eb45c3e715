"""Long-movie sequence parallelism: one movie's frame axis sharded across
the 8-virtual-device CPU mesh (SURVEY.md §5 long-context). The 8-device
result — halo exchange, per-chip detection, sharded chamfer association —
must equal the 1-device run of the same pipeline.

The detector is a DETERMINISTIC pooling stub (saturated per-cell
confidences, constant within-cell offsets): a random-weight CNN produces
knife-edge confidences whose order flips under the fp reassociation that
different program shapes legally introduce, which would test XLA numerics
rather than the sharding machinery. The real CNN path is covered by
test_model/test_pipeline and the TPU bench."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp
import flax.linen as nn

from axtrack_tpu.params import get_default_parameters
from axtrack_tpu.data.synthetic import make_synthetic_timelapse
from axtrack_tpu.parallel.mesh import make_mesh
from axtrack_tpu.parallel import longmovie


N_FRAMES = 8
MAXD = 8
TS = 48     # 48px tiles / 12x12 grid -> integer 4px cells


class PoolDetector(nn.Module):
    """Per-cell saturated brightness + centered offsets. Parameter-free and
    deterministic: bright cells -> conf exactly 1.0 (top_k tie-break is by
    flat cell index, identical across program shapes), dark cells ~0."""
    Sy: int = 12
    Sx: int = 12

    @nn.compact
    def __call__(self, x, train=False):
        c = x[..., x.shape[-1] // 2]              # center context frame
        N, H, W = c.shape
        cy, cx = H // self.Sy, W // self.Sx
        pooled = c.reshape(N, self.Sy, cy, self.Sx, cx).mean((2, 4))
        conf = jnp.minimum(pooled * 100.0, 1.0)   # saturate: huge margins
        conf = jnp.swapaxes(conf, 1, 2)           # [N, Sx, Sy]
        half = jnp.full_like(conf, 0.5)
        out = jnp.stack([conf, half, half], -1)   # [N, Sx, Sy, 3]
        return out.reshape(N, -1)

    def reshape_grid(self, pred):
        return pred.reshape(pred.shape[0], self.Sx, self.Sy, 3)


@pytest.fixture(scope='module')
def setup():
    P = get_default_parameters()
    P.update(dict(TILESIZE=TS))
    tc = P['TEMPORAL_CONTEXT']
    frames, mask, labels = make_synthetic_timelapse(
        T=N_FRAMES + 2 * tc, H=192, W=240, n_axons=6, seed=3, n_channels=4)
    frames_u16 = (np.clip(frames, 0, 1) * 65535).astype(np.uint16)
    model = PoolDetector()
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, TS, TS, 5)))
    return P, frames_u16, mask, model, variables


def run(setup, n_data, var_scalar=1.0):
    P, frames_u16, mask, model, variables = setup
    mesh = make_mesh(n_data=n_data, n_model=1,
                     devices=jax.devices()[:n_data])
    return longmovie.long_movie_pipeline(
        mesh, model, variables, P, frames_u16, mask, max_dets=MAXD,
        window=64, max_sweeps=8, var_scalar=var_scalar)


class TestLongMovieSharding:
    def test_8dev_equals_1dev(self, setup):
        dets8, dists8, ok8 = run(setup, 8)
        dets1, dists1, ok1 = run(setup, 1)
        assert ok8.all() and ok1.all()
        assert len(dets8) == len(dets1) == N_FRAMES
        assert sum(len(d['x']) for d in dets8) > 0
        for d8, d1 in zip(dets8, dets1):
            np.testing.assert_array_equal(d8['x'], d1['x'])
            np.testing.assert_array_equal(d8['y'], d1['y'])
            np.testing.assert_allclose(d8['conf'], d1['conf'], atol=1e-6)
        assert set(dists8) == set(dists1)
        for k in dists8:
            np.testing.assert_array_equal(dists8[k], dists1[k])

    def test_lookback_pairs_cover_gaps(self, setup):
        dets8, dists8, _ = run(setup, 8)
        want = {(s + g, g) for s in range(N_FRAMES) for g in (1, 2)
                if s + g < N_FRAMES}
        assert set(dists8) == want
        for (t, g), D in dists8.items():
            assert D.shape == (len(dets8[t - g]['x']), len(dets8[t]['x']))
            assert (D >= 1).all() and (D <= 500).all()

    def test_self_standardization_psum_path(self, setup):
        """var_scalar=None computes movie stats with a psum; the sharded
        scalar must match the single-device one (same detections)."""
        dets8, _, ok8 = run(setup, 8, var_scalar=None)
        dets1, _, _ = run(setup, 1, var_scalar=None)
        assert ok8.all()
        for d8, d1 in zip(dets8, dets1):
            np.testing.assert_array_equal(d8['x'], d1['x'])
            np.testing.assert_allclose(d8['conf'], d1['conf'], atol=1e-4)

    def test_max_gap_3(self, setup):
        """MCF_MAX_NUM_MISSES=2 needs lookback gaps 1..3: the sharded
        association must produce gap-3 pairs (regression: max_gap was
        hardcoded to 2, silently dropping gap>=3 transition edges)."""
        P, frames_u16, mask, model, variables = setup
        mesh = make_mesh(n_data=4, n_model=1, devices=jax.devices()[:4])
        dets, dists, ok = longmovie.long_movie_pipeline(
            mesh, model, variables, P, frames_u16, mask, max_dets=MAXD,
            window=64, max_sweeps=8, var_scalar=1.0, max_gap=3)
        assert ok.all()
        want = {(s + g, g) for s in range(N_FRAMES) for g in (1, 2, 3)
                if s + g < N_FRAMES}
        assert set(dists) == want
        # gap-1/2 matrices must be identical to the max_gap=2 run
        _, dists2, _ = run(setup, 4)
        for k in dists2:
            np.testing.assert_array_equal(dists[k], dists2[k])
