"""Test config: run JAX on a virtual 8-device CPU mesh.

The environment pins JAX_PLATFORMS=axon (TPU tunnel); tests force CPU both
via env (before import) and jax.config (the axon plugin overrides env vars).
"""
import os

os.environ['JAX_PLATFORMS'] = 'cpu'
xla_flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in xla_flags:
    os.environ['XLA_FLAGS'] = (
        xla_flags + ' --xla_force_host_platform_device_count=8').strip()

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.devices()[0].platform == 'cpu'
assert len(jax.devices()) == 8


@pytest.fixture
def rng():
    return np.random.default_rng(0)
