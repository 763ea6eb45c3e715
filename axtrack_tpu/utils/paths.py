"""A* path helper (public API parity with reference utils.py:351-390)."""
import numpy as np
from scipy import sparse


def _compute_astar_path(source, target, weights, return_dist=True,
                        max_path_length=10000):
    """Compute the A* path between two coordinates on a weight matrix.

    Same contract as the reference helper (utils.py:351-390): returns a
    scipy.sparse.coo_matrix of the path (bool) or None when no path within
    ``max_path_length`` exists; optionally also the node-count distance.
    Backed by the native C++ solver (native/astar.cpp) instead of pyastar2d.
    """
    from .. import native
    path_coo = native.astar_path(np.asarray(weights, np.float32),
                                 (int(source[0]), int(source[1])),
                                 (int(target[0]), int(target[1])),
                                 max_path_length)
    if path_coo is not None:
        ones = np.ones(path_coo.shape[0])
        rows, cols = path_coo[:, 0], path_coo[:, 1]
        path = sparse.coo_matrix((ones, (rows, cols)),
                                 np.asarray(weights).shape, dtype=bool)
        if return_dist:
            return path, path_coo.shape[0]
        return path
    if return_dist:
        return None, None
    return None
