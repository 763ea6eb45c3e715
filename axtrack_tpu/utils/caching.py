"""Tri-state stage caching ('to'/'from'/None).

The reference caches every expensive stage as pickles and re-runs 'from' cache
(Timelapse.py:435-449, AxonDetections.py:141-176); the tri-state API is part
of the public surface (interface.py:170-202), so it is preserved here as a
small helper class.
"""
import os
import pickle


class StageCache:
    """Pickle-backed cache of named stage outputs in a directory."""

    def __init__(self, directory, prefix=''):
        self.dir = directory
        self.prefix = prefix
        if self.dir:
            os.makedirs(self.dir, exist_ok=True)

    def path(self, which):
        name = f'{self.prefix}_{which}.pkl' if self.prefix else f'{which}.pkl'
        return os.path.join(self.dir or '.', name)

    def exists(self, which):
        return self.dir is not None and os.path.exists(self.path(which))

    def load(self, which):
        fname = self.path(which)
        print(f'Getting from cache: {os.path.basename(fname)}', flush=True)
        with open(fname, 'rb') as file:
            return pickle.load(file)

    def save(self, which, dat):
        if self.dir is None:
            return
        fname = self.path(which)
        print(f'Saving in cache: {os.path.basename(fname)}', flush=True)
        with open(fname, 'wb') as file:
            pickle.dump(dat, file, protocol=4)

    def run(self, which, mode, compute_fn):
        """mode: 'from' -> load; 'to' -> compute+save; None -> compute."""
        if mode == 'from':
            return self.load(which)
        result = compute_fn()
        if mode == 'to':
            self.save(which, result)
        return result
