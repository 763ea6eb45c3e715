"""Native C++ components, built lazily with g++ and bound via ctypes.

Replaces the reference's unvendored native submodules: pyastar2d (C++ grid
A*, reference .gitmodules:4-6, utils.py:379) and libmot/OR-Tools min-cost-flow
(reference .gitmodules:1-3, AxonDetections.py:663-696). See astar.cpp /
mcf.cpp for the semantics contract.
"""
import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB = None


def _build():
    src = [os.path.join(_DIR, 'astar.cpp'), os.path.join(_DIR, 'mcf.cpp')]
    out = os.path.join(_DIR, 'libaxtpu_native.so')
    newest_src = max(os.path.getmtime(s) for s in src)
    if not os.path.exists(out) or os.path.getmtime(out) < newest_src:
        cmd = ['g++', '-O3', '-march=native', '-shared', '-fPIC',
               '-std=c++17', *src, '-o', out]
        subprocess.run(cmd, check=True, capture_output=True)
    return out


def _lib():
    global _LIB
    if _LIB is None:
        lib = ctypes.CDLL(_build())
        i32p = np.ctypeslib.ndpointer(np.int32, flags='C_CONTIGUOUS')
        i64p = np.ctypeslib.ndpointer(np.int64, flags='C_CONTIGUOUS')
        f32p = np.ctypeslib.ndpointer(np.float32, flags='C_CONTIGUOUS')

        lib.axtpu_astar_path.restype = ctypes.c_int
        lib.axtpu_astar_path.argtypes = [
            f32p, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_float, i32p]

        lib.axtpu_astar_pairwise.restype = None
        lib.axtpu_astar_pairwise.argtypes = [
            f32p, ctypes.c_int, ctypes.c_int,
            i32p, ctypes.c_int, i32p, ctypes.c_int,
            ctypes.c_float, i32p]

        for fn in (lib.axtpu_solve_tracking_mcf,
                   lib.axtpu_solve_tracking_mcf_ssp):
            fn.restype = ctypes.c_int
            fn.argtypes = [
                ctypes.c_int, ctypes.c_int, i32p, i32p, i64p,
                ctypes.c_int, ctypes.c_int, i32p,
                ctypes.POINTER(ctypes.c_int64)]
        _LIB = lib
    return _LIB


def astar_path(weights, source, target, max_path_length=10000):
    """Grid A* path (pyastar2d.astar_path-compatible, reference utils.py:379).

    Args:
      weights: f32[H, W], >= 1 (2^16 outside the mask).
      source, target: (y, x).
      max_path_length: cap in px; longer/unreachable -> None.

    Returns i32[N, 2] of (y, x) path coords incl. endpoints, or None.
    """
    weights = np.ascontiguousarray(weights, np.float32)
    h, w = weights.shape
    out = np.zeros((int(max_path_length) + 2) * 2, np.int32)
    n = _lib().axtpu_astar_path(
        weights, h, w, int(source[0]), int(source[1]),
        int(target[0]), int(target[1]), float(max_path_length), out)
    if n < 0:
        return None
    return out[:2 * n].reshape(n, 2).copy()


def astar_pairwise(weights, sources_yx, targets_yx, max_path_length=500):
    """All-pairs geodesic node-count distances via capped Dijkstra per source.

    Returns i32[n_src, n_tgt]; -1 marks unreachable within the cap. This is
    the exact-parity oracle for ops/geodesic.py (one A* per detection pair
    in the reference, AxonDetections.py:573-577).
    """
    weights = np.ascontiguousarray(weights, np.float32)
    src = np.ascontiguousarray(np.asarray(sources_yx).reshape(-1, 2), np.int32)
    tgt = np.ascontiguousarray(np.asarray(targets_yx).reshape(-1, 2), np.int32)
    h, w = weights.shape
    out = np.empty((len(src), len(tgt)), np.int32)
    _lib().axtpu_astar_pairwise(weights, h, w, src, len(src), tgt, len(tgt),
                                float(max_path_length), out)
    return out


def solve_tracking_mcf(n_nodes, edges_from, edges_to, edge_costs,
                       min_flow, max_flow, cost_scale=1e6,
                       method='scaling'):
    """Solve the tracking min-cost-flow (see mcf.cpp).

    Args:
      n_nodes: total incl. source (n_nodes-2) and sink (n_nodes-1).
      edges_*: arrays over edges; float costs are scaled to int64.
      method: 'scaling' (cost-scaling push-relabel, the production solver)
        or 'ssp' (successive shortest paths — the slower oracle the
        scaling solver is fuzz-checked against; both return the smallest
        flow value minimizing total cost).

    Returns (achieved_flow, flow[n_edges] 0/1, total_cost float) or
    (None, None, None) when min_flow is infeasible — callers mirror the
    reference's graceful failure (AxonDetections.py:691-696).
    """
    ef = np.ascontiguousarray(edges_from, np.int32)
    et = np.ascontiguousarray(edges_to, np.int32)
    ec = np.ascontiguousarray(
        np.round(np.asarray(edge_costs, np.float64) * cost_scale), np.int64)
    flow = np.zeros(len(ef), np.int32)
    total = ctypes.c_int64(0)
    solve = {'scaling': _lib().axtpu_solve_tracking_mcf,
             'ssp': _lib().axtpu_solve_tracking_mcf_ssp}[method]
    f = solve(
        int(n_nodes), len(ef), ef, et, ec,
        int(min_flow), int(max_flow), flow, ctypes.byref(total))
    if f < 0:
        return None, None, None
    return f, flow, total.value / cost_scale
