"""Multi-host (pod / DCN) initialization helpers.

Single-host multi-chip needs nothing: ``make_mesh()`` builds the mesh over
the local chips and XLA places collectives on ICI. Across HOSTS (v5e pods
beyond one machine), JAX needs the distributed runtime bootstrapped before
any device query; after that the same mesh/sharding code works unchanged —
``jax.devices()`` returns the global device set and XLA routes
inter-host collectives over DCN and intra-host ones over ICI
(SURVEY.md §2.3/§5: distributed communication backend).

This repo's CI has one chip, so these helpers are exercised only in the
degenerate single-process form; they are the documented entry point for
pod-scale deployments.
"""
import jax

from .mesh import make_mesh


def init_distributed(coordinator_address=None, num_processes=None,
                     process_id=None):
    """Bootstrap the JAX distributed runtime (idempotent).

    With no arguments, jax.distributed.initialize() auto-discovers the
    cluster on TPU pods (GCE metadata). Pass explicit values for manual
    rendezvous: coordinator 'host:port', the world size, and this process'
    rank. Safe to call in single-process runs — initialization errors from
    an absent cluster are swallowed and the local backend is used.
    """
    try:
        if coordinator_address is None and num_processes is None:
            jax.distributed.initialize()
        else:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes, process_id=process_id)
    except (RuntimeError, ValueError):
        pass  # already initialized, or single-process: local backend
    return jax.process_count(), jax.process_index()


def make_global_mesh(n_model=None):
    """('data', 'model') mesh over ALL processes' devices. Call
    init_distributed() first on pods. The 'model' (tensor-parallel) axis is
    kept within a host's chips by construction — jax.devices() orders
    devices host-major, and make_mesh folds the trailing axis into 'model' —
    so TP collectives ride ICI and only data-parallel gradient reductions
    cross DCN (the scaling-book layout recipe)."""
    return make_mesh(n_model=n_model, devices=jax.devices())
