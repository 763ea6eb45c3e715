"""Unit tests for preproc / tiling / decode / NMS / target ops against
straightforward numpy reference implementations (the reference repo ships no
tests — SURVEY.md §4 — so these reimplement its documented semantics)."""
import numpy as np
import jax.numpy as jnp
import pytest

from axtrack_tpu.ops.preproc import (preprocess_frames, nonzero_stats,
                                     compute_stnd_scaler, adjust_log)
from axtrack_tpu.ops.tiling import (tile_frames, untile_frames,
                                    nonempty_tile_mask, tile_index_table,
                                    temporal_context_stack)
from axtrack_tpu.ops.decode import decode_tiled, distance_nms
from axtrack_tpu.ops.targets import labels_to_yolo_grid


class TestPreproc:
    def test_chain_matches_numpy(self, rng):
        im = rng.random((3, 64, 96)).astype(np.float32)
        mask = np.zeros((64, 96), bool)
        mask[10:50, 20:80] = True
        out = np.asarray(preprocess_frames(
            jnp.asarray(im), jnp.asarray(mask), 0.05, 0.1, 2.0))
        ref = im.copy()
        ref[:, ~mask] = 0
        ref = np.maximum(ref - 0.05, 0)
        ref[ref < 0.1] = 0
        ref = np.log2(1 + ref)
        ref = ref / 2.0
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)

    def test_nonzero_stats_matches_sparse_semantics(self, rng):
        im = rng.random((4, 32, 32)).astype(np.float32)
        im[im < 0.5] = 0.0
        mean, std, mx = (np.asarray(a) for a in nonzero_stats(jnp.asarray(im)))
        for t in range(4):
            data = im[t][im[t] != 0]   # coo_matrix(frame).data equivalent
            np.testing.assert_allclose(mean[t], data.mean(), rtol=1e-5)
            np.testing.assert_allclose(std[t], data.std(), rtol=1e-4)
            np.testing.assert_allclose(mx[t], data.max(), rtol=1e-6)

    def test_compute_stnd_scaler(self, rng):
        im = rng.random((4, 32, 32)).astype(np.float32)
        im[im < 0.3] = 0
        var, mean = compute_stnd_scaler(jnp.asarray(im), 'zscore')
        stds = [im[t][im[t] != 0].std() for t in range(4)]
        means = [im[t][im[t] != 0].mean() for t in range(4)]
        np.testing.assert_allclose(var, np.mean(stds), rtol=1e-4)
        np.testing.assert_allclose(mean, np.mean(means), rtol=1e-4)

    def test_adjust_log_gain1(self):
        x = jnp.asarray([0.0, 0.5, 1.0])
        np.testing.assert_allclose(np.asarray(adjust_log(x)),
                                   np.log2(1 + np.asarray(x)), rtol=1e-6)


class TestTiling:
    def test_roundtrip(self, rng):
        fr = rng.random((3, 100, 130)).astype(np.float32)
        tiles = tile_frames(jnp.asarray(fr), 64)
        assert tiles.shape == (3, 2, 3, 64, 64)
        back = untile_frames(tiles, 100, 130)
        np.testing.assert_array_equal(np.asarray(back), fr)

    def test_tile_content(self, rng):
        fr = rng.random((1, 128, 128)).astype(np.float32)
        tiles = np.asarray(tile_frames(jnp.asarray(fr), 64))
        np.testing.assert_array_equal(tiles[0, 1, 0], fr[0, 64:, :64])

    def test_nonempty_mask_and_index(self):
        fr = np.zeros((2, 128, 128), np.float32)
        fr[0, 70, 70] = 1.0   # tile (1,1)
        fr[1, 10, 100] = 1.0  # tile (0,1)
        tiles = tile_frames(jnp.asarray(fr), 64)
        mask = nonempty_tile_mask(np.asarray(tiles))
        assert mask.tolist() == [[False, True], [False, True]]
        flat, yx = tile_index_table(mask)
        assert flat.tolist() == [1, 3]
        assert yx.tolist() == [[0, 1], [1, 1]]

    def test_temporal_context(self, rng):
        fr = rng.random((9, 2, 8, 8)).astype(np.float32)  # [T_all, K, ts, ts]
        centers = jnp.asarray([2, 3], jnp.int32)
        out = np.asarray(temporal_context_stack(jnp.asarray(fr), centers, 2))
        assert out.shape == (2, 2, 8, 8, 5)
        np.testing.assert_array_equal(out[0, :, :, :, 0], fr[0])
        np.testing.assert_array_equal(out[0, :, :, :, 2], fr[2])
        np.testing.assert_array_equal(out[1, :, :, :, 4], fr[5])


class TestDecode:
    def _decode_ref(self, grids, tile_yx, conf_thr, ts):
        """Direct numpy transcription of AxonDetections.py:192-248."""
        K, Sx, Sy, C = grids.shape
        out = []
        for k in range(K):
            for gx in range(Sx):
                for gy in range(Sy):
                    conf = grids[k, gx, gy, 0]
                    if conf >= conf_thr:
                        x = round((grids[k, gx, gy, 1] + gx) * ts / Sx)
                        y = round((grids[k, gx, gy, 2] + gy) * ts / Sy)
                        out.append((conf, x + tile_yx[k, 1] * ts,
                                    y + tile_yx[k, 0] * ts))
        return sorted(out, key=lambda r: -r[0])

    def test_matches_reference_semantics(self, rng):
        K, Sx, Sy, ts = 3, 12, 12, 512
        grids = np.zeros((K, Sx, Sy, 3), np.float32)
        n = 30
        kk = rng.integers(0, K, n)
        gx = rng.integers(0, Sx, n)
        gy = rng.integers(0, Sy, n)
        grids[kk, gx, gy, 0] = rng.random(n) * 1.4
        grids[kk, gx, gy, 1] = rng.random(n)
        grids[kk, gx, gy, 2] = rng.random(n)
        tile_yx = np.array([[0, 0], [0, 1], [2, 3]], np.int32)

        dets = decode_tiled(jnp.asarray(grids), jnp.asarray(tile_yx),
                            0.55, ts, max_dets=64)
        got = [(float(c), float(x), float(y)) for c, x, y, v in
               zip(dets['conf'], dets['x'], dets['y'], dets['valid']) if v]
        want = self._decode_ref(grids, tile_yx, 0.55, ts)
        assert len(got) == len(want)
        for (c1, x1, y1), (c2, x2, y2) in zip(got, want):
            assert abs(c1 - c2) < 1e-6
            assert x1 == x2 and y1 == y2

    def test_max_dets_truncates_lowest_conf(self, rng):
        grids = np.zeros((1, 12, 12, 3), np.float32)
        grids[0, :, :, 0] = rng.random((12, 12)) + 0.6   # all above thr
        dets = decode_tiled(jnp.asarray(grids), jnp.asarray([[0, 0]]),
                            0.55, 512, max_dets=16)
        assert int(dets['valid'].sum()) == 16
        confs = np.sort(grids[0, :, :, 0].ravel())[::-1]
        np.testing.assert_allclose(np.asarray(dets['conf']), confs[:16],
                                   rtol=1e-6)


class TestNMS:
    def _nms_ref(self, dets, radius):
        """Transcription of AxonDetections.py:250-278 greedy loop."""
        dets = sorted(dets, key=lambda r: -r[0])
        i = 0
        while i < len(dets):
            _, x, y = dets[i]
            dets = dets[:i + 1] + [
                d for d in dets[i + 1:]
                if np.sqrt(int((d[1] - x) ** 2 + (d[2] - y) ** 2)) >= radius]
            i += 1
        return dets

    def test_matches_reference_greedy(self, rng):
        n, pad = 60, 64
        conf = np.sort(rng.random(n).astype(np.float32))[::-1]
        x = rng.integers(0, 300, n).astype(np.float32)
        y = rng.integers(0, 300, n).astype(np.float32)
        valid = np.zeros(pad, bool)
        valid[:n] = True
        alive = distance_nms(jnp.asarray(np.pad(conf, (0, pad - n))),
                             jnp.asarray(np.pad(x, (0, pad - n))),
                             jnp.asarray(np.pad(y, (0, pad - n))),
                             jnp.asarray(valid), 23)
        got = [(float(conf[i]), float(x[i]), float(y[i]))
               for i in range(n) if alive[i]]
        want = self._nms_ref(list(zip(conf, x, y)), 23)
        assert got == [tuple(map(float, w)) for w in want]


class TestTargets:
    def test_scatter_matches_reference_formula(self):
        ts, Sy, Sx = 512, 12, 12
        anchors = np.array([[100.0, 200.0],    # t0: tile (0,0)
                            [600.0, 900.0],    # t1: tile (1,1)
                            [511.0, 1023.0]],  # t0: tile (0,1) edge
                           np.float32)
        ids = np.array([0, 1, 2], np.int32)
        t_idx = np.array([0, 1, 0], np.int32)
        valid = np.ones(3, bool)
        grid = np.asarray(labels_to_yolo_grid(
            jnp.asarray(anchors), jnp.asarray(ids), jnp.asarray(t_idx),
            jnp.asarray(valid), ny=2, nx=2, Sy=Sy, Sx=Sx, tilesize=ts,
            n_frames=2))
        assert grid.shape == (2, 2, 2, Sx, Sy, 4)
        # anchor 0: y=100,x=200 in tile(0,0): yolo_y=100/512*12=2.34->cell 2,
        # yolo_x=200/512*12=4.69->cell 4
        g = grid[0, 0, 0, 4, 2]
        assert g[0] == 1.0
        np.testing.assert_allclose(g[1], 200 / 512 * 12 - 4, rtol=1e-5)
        np.testing.assert_allclose(g[2], 100 / 512 * 12 - 2, rtol=1e-5)
        assert g[3] == 0
        # anchor 1: in-tile coords (88, 388)
        g = grid[1, 1, 1, int(388 / 512 * 12), int(88 / 512 * 12)]
        assert g[0] == 1.0 and g[3] == 1
        # anchor 2: edge coords in tile (0,1): (511, 511) -> cells (11, 11)
        g = grid[0, 0, 1, 11, 11]
        assert g[0] == 1.0 and g[3] == 2
        # exactly 3 positive cells
        assert grid[..., 0].sum() == 3

    def test_tiled_target2yolo_format_matches_fused_scatter(self):
        """The public per-tile utility (Timelapse.tiled_target2yolo_format,
        reference Timelapse.py:451-490) agrees with the fused device
        scatter used by construct_tiles."""
        from axtrack_tpu.data.timelapse import Timelapse
        ts, Sy, Sx = 512, 12, 12
        tl = Timelapse.__new__(Timelapse)
        tl.tilesize, tl.Sy, tl.Sx = ts, Sy, Sx
        # 2x2 tiles, 2 frames, 3 axons; tile-LOCAL (y, x); -1 = absent
        tt = np.full((2, 2, 2, 3, 2), -1.0, np.float32)
        tt[0, 0, 0, 0] = (100.0, 200.0)
        tt[1, 1, 1, 1] = (88.0, 388.0)
        tt[0, 1, 0, 2] = (511.0, 511.0)
        got = tl.tiled_target2yolo_format(tt)
        assert got.shape == (2, 2, 2, Sx, Sy, 4)

        # same labels in frame-global coords through the fused scatter
        anchors = np.array([[100.0, 200.0], [600.0, 900.0],
                            [511.0, 1023.0]], np.float32)
        grid = np.asarray(labels_to_yolo_grid(
            jnp.asarray(anchors), jnp.asarray([0, 1, 2]),
            jnp.asarray([0, 1, 0]), jnp.asarray([True] * 3),
            ny=2, nx=2, Sy=Sy, Sx=Sx, tilesize=ts, n_frames=2))
        # fused grid is [T, ny, nx, Sx, Sy, 4]; utility is [ny, nx, T, ...]
        np.testing.assert_allclose(got.transpose(2, 0, 1, 3, 4, 5), grid,
                                   atol=1e-5)

    def test_padded_labels_dropped(self):
        anchors = np.array([[10.0, 10.0]], np.float32)
        grid = np.asarray(labels_to_yolo_grid(
            jnp.asarray(anchors), jnp.asarray([5]), jnp.asarray([0]),
            jnp.asarray([False]), ny=1, nx=1, Sy=12, Sx=12, tilesize=512,
            n_frames=1))
        assert grid.sum() == 0


class TestPackedGather:
    def test_packed_equals_per_pair_gathers(self):
        """detections._packed_gather_program (one vmapped program + one
        fetch for all lookback pairs of a chamfer group) must equal the
        straightforward per-pair _gather_targets calls, including target
        padding sentinels and out-of-range slice rows."""
        import jax.numpy as jnp
        from axtrack_tpu.detections import _packed_gather_program
        from axtrack_tpu.ops.geodesic import _gather_targets
        rng = np.random.default_rng(0)
        window, Dmax, N = 32, 8, 19      # N not a multiple of Dmax
        dmaps = rng.integers(1, 60, (N, window, window)).astype(np.float32)
        origins = rng.integers(0, 50, (N, 2)).astype(np.int32)
        BAD = np.int32(-10 ** 6)
        pairs = [(0, 5), (5, 8), (13, 6), (16, 3)]   # (offset, n_valid_src)
        offs, tgts = [], []
        for off, _ in pairs:
            ty = rng.integers(0, 80, Dmax).astype(np.int32)
            ty[Dmax - 2:] = BAD                      # padded targets
            tx = rng.integers(0, 80, Dmax).astype(np.int32)
            tgts.append(np.stack([ty, tx], -1))
            offs.append(off)
        P_b = 4
        run = _packed_gather_program(window, Dmax, P_b)
        out = np.asarray(run(jnp.asarray(dmaps), jnp.asarray(origins),
                             jnp.asarray(np.asarray(offs, np.int32)),
                             jnp.asarray(np.stack(tgts)),
                             jnp.float32(100), jnp.bool_(True)))
        assert out[-1] == 1.0
        D = out[:-1].reshape(P_b, Dmax, Dmax)
        for i, (off, n_src) in enumerate(pairs):
            hi = min(off + Dmax, N)
            want = np.asarray(_gather_targets(
                jnp.asarray(dmaps[off:hi]), jnp.asarray(origins[off:hi]),
                jnp.asarray(tgts[i]), jnp.float32(100), window))
            np.testing.assert_array_equal(D[i][:hi - off], want)
