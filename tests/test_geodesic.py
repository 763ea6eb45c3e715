"""Parity tests: JAX geodesic wavefront kernel vs the C++ A* oracle."""
import numpy as np
import pytest

from axtrack_tpu import native
from axtrack_tpu.ops.geodesic import geodesic_pairwise


def oracle_pairwise(mask, srcs, tgts, max_dist):
    wts = np.where(mask, 1.0, 2.0 ** 16).astype(np.float32)
    d = native.astar_pairwise(wts, srcs, tgts, max_dist).astype(np.float32)
    d[d < 0] = max_dist
    return d


def random_points(mask, n, rng, on_mask=True):
    ys, xs = np.where(mask if on_mask else np.ones_like(mask))
    idx = rng.choice(len(ys), n, replace=False)
    return np.stack([ys[idx], xs[idx]], -1).astype(np.int32)


class TestGeodesicParity:
    def test_open_grid_is_l1(self, rng):
        mask = np.ones((64, 64), bool)
        srcs = random_points(mask, 5, rng)
        tgts = random_points(mask, 7, rng)
        D = np.asarray(geodesic_pairwise(mask, srcs, tgts, max_dist=500,
                                         window=64, max_sweeps=4))
        l1 = (np.abs(srcs[:, None] - tgts[None]).sum(-1) + 1).astype(np.float32)
        np.testing.assert_array_equal(D, np.minimum(l1, 500))

    def test_channel_mask_matches_oracle(self, rng):
        # two horizontal channels joined by one vertical corridor
        mask = np.zeros((96, 128), bool)
        mask[10:25, :] = True
        mask[70:85, :] = True
        mask[10:85, 60:66] = True
        srcs = random_points(mask, 8, rng)
        tgts = random_points(mask, 8, rng)
        D = np.asarray(geodesic_pairwise(mask, srcs, tgts, max_dist=500,
                                         window=128, max_sweeps=8))
        np.testing.assert_array_equal(D, oracle_pairwise(mask, srcs, tgts, 500))

    def test_serpentine_needs_sweeps(self, rng):
        # snake corridor forcing many direction reversals
        mask = np.zeros((64, 64), bool)
        for i, y in enumerate(range(2, 62, 8)):
            mask[y:y + 4, 2:62] = True
            if y + 8 < 62:
                if i % 2 == 0:
                    mask[y:y + 12, 58:62] = True
                else:
                    mask[y:y + 12, 2:6] = True
        srcs = np.array([[4, 4]], np.int32)
        tgts = random_points(mask, 10, rng)
        D = np.asarray(geodesic_pairwise(mask, srcs, tgts, max_dist=500,
                                         window=64, max_sweeps=16))
        np.testing.assert_array_equal(D, oracle_pairwise(mask, srcs, tgts, 500))

    def test_unreachable_and_cap(self, rng):
        mask = np.ones((64, 64), bool)
        mask[:, 30:34] = False          # full wall
        srcs = np.array([[32, 5]], np.int32)
        tgts = np.array([[32, 60], [32, 6]], np.int32)
        D = np.asarray(geodesic_pairwise(mask, srcs, tgts, max_dist=500,
                                         window=64))
        assert D[0, 0] == 500           # unreachable -> cap
        assert D[0, 1] == 2             # neighbor: two nodes

    def test_off_mask_source_seeds_neighbors(self):
        """A* ignores the start cell's weight — a detection just outside the
        mask still reaches in-mask targets (see astar.cpp contract)."""
        mask = np.ones((32, 32), bool)
        mask[10, 10] = False
        srcs = np.array([[10, 10]], np.int32)
        tgts = np.array([[10, 12]], np.int32)
        D = np.asarray(geodesic_pairwise(mask, srcs, tgts, max_dist=500,
                                         window=32))
        want = oracle_pairwise(mask, srcs, tgts, 500)
        np.testing.assert_array_equal(D, want)
        assert D[0, 0] == 3

    def test_off_mask_target_unreachable(self):
        mask = np.ones((32, 32), bool)
        mask[20, 20] = False
        D = np.asarray(geodesic_pairwise(
            mask, np.array([[5, 5]], np.int32),
            np.array([[20, 20]], np.int32), max_dist=500, window=32))
        assert D[0, 0] == 500

    def test_windowing_on_large_frame(self, rng):
        """Window smaller than frame: far-apart sources get correct local
        distances; beyond-window targets collapse to the cap."""
        mask = np.ones((256, 512), bool)
        mask[100:140, :] = False
        mask[100:140, 250:260] = True       # corridor
        srcs = np.array([[50, 250], [200, 250]], np.int32)
        tgts = np.array([[50, 260], [200, 260], [50, 251]], np.int32)
        D = np.asarray(geodesic_pairwise(mask, srcs, tgts, max_dist=200,
                                         window=256, max_sweeps=8))
        want = oracle_pairwise(mask, srcs, tgts, 200)
        np.testing.assert_array_equal(D, want)

class TestPallasConvergence:
    """batched_windows_converged guarantees exactness on masks whose
    geodesics have more direction reversals than the fixed sweep count
    (VERDICT r1 weak #5). Kernel runs in interpret mode on CPU."""

    def _serpentine(self):
        """VERTICAL corridors joined alternately top/bottom: the geodesic's
        vertical direction reverses every leg, so each down+up sweep only
        resolves ~2 legs — a fixed small sweep count under-converges."""
        mask = np.zeros((64, 64), bool)
        for i, y in enumerate(range(2, 62, 8)):
            mask[y:y + 4, 2:62] = True
            if y + 8 < 62:
                if i % 2 == 0:
                    mask[y:y + 12, 58:62] = True
                else:
                    mask[y:y + 12, 2:6] = True
        return mask.T.copy()

    def test_fixed_sweeps_insufficient_converged_exact(self):
        from axtrack_tpu.ops.geodesic_pallas import (
            batched_windows_pallas, batched_windows_converged)
        from axtrack_tpu.ops.geodesic import _gather_targets
        import jax.numpy as jnp
        mask = self._serpentine()
        srcs = np.array([[4, 4]], np.int32)
        tgts = np.array([[50, 58], [30, 30], [40, 4]], np.int32)
        want = oracle_pairwise(mask, srcs, tgts, 500)

        m = jnp.asarray(mask)
        d_fix, org = batched_windows_pallas(m, srcs, 64, max_sweeps=2,
                                            interpret=True)
        got_fix = np.asarray(_gather_targets(d_fix, org, jnp.asarray(tgts),
                                             jnp.float32(500), 64))
        # the fixed 2-sweep run must be WRONG here (over-reported) ...
        assert (got_fix > want).any()
        # ... and the converged path oracle-exact
        d_conv, org2 = batched_windows_converged(m, srcs, 64, max_sweeps=2,
                                                 interpret=True)
        got = np.asarray(_gather_targets(d_conv, org2, jnp.asarray(tgts),
                                         jnp.float32(500), 64))
        np.testing.assert_array_equal(got, want)

    def test_certificate_flags_underconverged_maps(self):
        """The local-consistency certificate (batched_windows_probed's
        third return) is False exactly when a fixed sweep budget
        under-converged, and True once the maps are oracle-exact."""
        from axtrack_tpu.ops.geodesic_pallas import batched_windows_probed
        import jax.numpy as jnp
        mask = self._serpentine()
        srcs = np.array([[4, 4]], np.int32)
        m = jnp.asarray(mask)
        _, _, ok2 = batched_windows_probed(m, srcs, 64, max_sweeps=2,
                                           interpret=True)
        assert not bool(ok2)
        _, _, ok32 = batched_windows_probed(m, srcs, 64, max_sweeps=32,
                                            interpret=True)
        assert bool(ok32)

    def test_converged_probe_is_noop_when_converged(self):
        """On an open grid the first launch converges; the probe must not
        change anything."""
        from axtrack_tpu.ops.geodesic_pallas import (
            batched_windows_pallas, batched_windows_converged)
        mask = np.ones((64, 64), bool)
        srcs = np.array([[10, 12], [40, 30]], np.int32)
        import jax.numpy as jnp
        m = jnp.asarray(mask)
        d1, _ = batched_windows_pallas(m, srcs, 64, max_sweeps=4,
                                       interpret=True)
        d2, _ = batched_windows_converged(m, srcs, 64, max_sweeps=4,
                                          interpret=True)
        np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))


class TestBandCulling:
    """The kernel culls its sweep loops to each program's passable-row
    band (after sorting windows by band) — rows with zero passable cells
    are provably INF at every sweep count, so culling must be invisible.
    These masks make the bands narrow, disjoint, and mixed with
    full-height windows so blocks would union to the full window without
    the sort."""

    def test_thin_bands_match_lax_and_oracle(self, rng):
        from axtrack_tpu.ops.geodesic_pallas import batched_windows_probed
        from axtrack_tpu.ops.geodesic import (_batched_windows,
                                              _gather_targets)
        import jax.numpy as jnp
        H, W = 96, 128
        mask = np.zeros((H, W), bool)
        mask[30:38, :] = True                 # band A
        mask[70:74, 20:100] = True            # band B (disjoint rows)
        mask[38:70, 60:64] = True             # vertical passage A<->B
        # sources in both bands, the passage, and near frame edges (clipped
        # origins put the band at varying LOCAL offsets — the sort's job)
        srcs = np.array([[33, 10], [71, 90], [50, 61], [33, 120],
                         [31, 64], [72, 40], [33, 2]], np.int32)
        m = jnp.asarray(mask)
        window = 64
        dm_p, org_p, ok = batched_windows_probed(m, srcs, window,
                                                 max_sweeps=8,
                                                 interpret=True)
        assert bool(ok)
        dm_l, org_l = _batched_windows(m, srcs, window, max_sweeps=8)
        np.testing.assert_array_equal(np.asarray(org_p), np.asarray(org_l))
        a, b = np.asarray(dm_p), np.asarray(dm_l)
        fin = (a < 1e8) | (b < 1e8)
        np.testing.assert_array_equal(a[fin], b[fin])
        # oracle spot check through the gather: src i -> tgt i are
        # in-window pairs (incl. a cross-band one through the passage);
        # off-diagonal pairs may leave the 64px window, where windowed
        # semantics (cap) intentionally diverge from the global oracle
        tgts = np.array([[33, 40], [71, 60], [50, 62]], np.int32)
        got = np.asarray(_gather_targets(dm_p, org_p, jnp.asarray(tgts),
                                         jnp.float32(500), window))
        want = oracle_pairwise(mask, srcs[:3], tgts, 500)
        np.testing.assert_array_equal(np.diag(got[:3]), np.diag(want))

    def test_pad_windows_cannot_affect_results(self):
        """src_bucket pads the source count; pad windows (local (0,0))
        sort to the front and collapse to one slab — real maps must be
        identical to an unpadded-count run."""
        from axtrack_tpu.ops.geodesic_pallas import batched_windows_probed
        import jax.numpy as jnp
        mask = np.zeros((64, 64), bool)
        mask[40:46, :] = True
        m = jnp.asarray(mask)
        srcs3 = np.array([[42, 5], [43, 30], [41, 60]], np.int32)
        srcs2 = srcs3[:2]
        d3, o3, ok3 = batched_windows_probed(m, srcs3, 64, max_sweeps=4,
                                             interpret=True)
        d2, o2, ok2 = batched_windows_probed(m, srcs2, 64, max_sweeps=4,
                                             interpret=True)
        assert bool(ok3) and bool(ok2)
        np.testing.assert_array_equal(np.asarray(d3)[:2], np.asarray(d2))
        np.testing.assert_array_equal(np.asarray(o3)[:2], np.asarray(o2))


class TestRandomMasks:
    @pytest.mark.parametrize('seed', [1, 2, 3])
    def test_random_blob_masks(self, seed):
        rng = np.random.default_rng(seed)
        mask = rng.random((80, 80)) > 0.35
        # ensure some connectivity
        mask[40, :] = True
        srcs = random_points(mask, 6, rng)
        tgts = random_points(mask, 6, rng)
        D = np.asarray(geodesic_pairwise(mask, srcs, tgts, max_dist=300,
                                         window=80, max_sweeps=40))
        np.testing.assert_array_equal(D, oracle_pairwise(mask, srcs, tgts, 300))


class TestVmemBlocking:
    """ADVICE r2 medium: window=1024 (selected by assign_ids whenever
    MCF_vis_sim_weight != 0 -> d_eff=500 -> window rounds to 1024) must fit
    VMEM: SRC_BLOCK shrinks with the window area."""

    def test_src_block_fits_budget(self):
        from axtrack_tpu.ops import geodesic_pallas as GP
        for window in (64, 128, 256, 512, 1024, 2048):
            blk = GP._src_block(window)
            assert blk >= 1 and (blk & (blk - 1)) == 0
            # crop + out + init blocks resident, worst case (continuation)
            resident = 3 * blk * window * window * 4
            assert resident <= GP._VMEM_BUDGET, (window, blk)
        assert GP._src_block(512) == GP.SRC_BLOCK
        assert GP._src_block(1024) == 4

    def test_window_1024_interpret_parity(self):
        """Numerics at the shrunken block size: window=1024 maps match the
        oracle (interpret mode; real-chip compile is covered by
        scripts/check_window1024.py on TPU)."""
        from axtrack_tpu.ops.geodesic_pallas import batched_windows_probed
        from axtrack_tpu.ops.geodesic import _gather_targets
        import jax.numpy as jnp
        rng = np.random.default_rng(7)
        mask = np.ones((1024, 1024), bool)
        mask[100:900, 500:510] = False       # wall with a gap
        mask[495:505, 500:510] = True
        srcs = np.array([[400, 300], [600, 700]], np.int32)
        tgts = np.array([[400, 700], [600, 300], [410, 310]], np.int32)
        m = jnp.asarray(mask)
        dmaps, org, ok = batched_windows_probed(m, srcs, 1024, max_sweeps=4,
                                                interpret=True)
        assert dmaps.shape == (2, 1024, 1024)
        assert bool(ok)
        got = np.asarray(_gather_targets(dmaps, org, jnp.asarray(tgts),
                                         jnp.float32(5000), 1024))
        want = oracle_pairwise(mask, srcs, tgts, 5000)
        np.testing.assert_array_equal(got, want)


class TestCertificatePadding:
    """ADVICE r2 low: pad sources sit at (0,0); a slow-converging mask
    corner there must not veto the certificate when all REAL maps are
    exact."""

    def test_pad_entries_cannot_veto(self):
        from axtrack_tpu.ops.geodesic_pallas import batched_windows_probed
        import jax.numpy as jnp
        # corner (0,0) region: serpentine (many direction reversals, needs
        # many sweeps); real source sits in an open area far away
        mask = np.ones((192, 192), bool)
        mask[:64, :64] = False
        for i, y in enumerate(range(2, 62, 8)):
            mask[y:y + 4, 2:62] = True
            if y + 8 < 62:
                if i % 2 == 0:
                    mask[y:y + 12, 58:62] = True
                else:
                    mask[y:y + 12, 2:6] = True
        srcs = np.array([[150, 150]], np.int32)     # N=1, Np=SRC_BLOCK pads
        m = jnp.asarray(mask)
        _, _, ok = batched_windows_probed(m, srcs, 64, max_sweeps=2,
                                          interpret=True)
        assert bool(ok)          # open-area real map converges in 1 sweep


class TestSrcBucket:
    def test_bucket_sizes(self):
        from axtrack_tpu.ops.geodesic_pallas import src_bucket, _src_block
        b = _src_block(512)
        # tiny counts: power-of-two from the kernel block (tests stay tiny)
        assert src_bucket(1, 512) == b
        assert src_bucket(b, 512) == b
        assert src_bucket(b + 1, 512) == 2 * b
        assert src_bucket(100, 512) == 128
        # above 128: multiples of 64 (linear kernel compute, bounded
        # compile count) — 305 real sources run 320 windows, not 512
        assert src_bucket(129, 512) == 192
        assert src_bucket(305, 512) == 320
        assert src_bucket(512, 512) == 512
        # idempotent (a bucket is its own bucket: callers may pre-pad)
        for n in (16, 64, 128, 192, 320, 512, 1024):
            assert src_bucket(src_bucket(n, 512), 512) == src_bucket(n, 512)
        # always a multiple of the kernel block
        for w in (128, 256, 512, 1024):
            for n in (1, 7, 65, 129, 300, 1000):
                assert src_bucket(n, w) % _src_block(w) == 0
                assert src_bucket(n, w) >= n
