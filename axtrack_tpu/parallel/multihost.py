"""Multi-host (pod / DCN) initialization helpers.

Single-host multi-chip needs nothing: ``make_mesh()`` builds the mesh over
the local chips and XLA places collectives on ICI. Across HOSTS (v5e pods
beyond one machine), JAX needs the distributed runtime bootstrapped before
any device query; after that the same mesh/sharding code works unchanged —
``jax.devices()`` returns the global device set and XLA routes
inter-host collectives over DCN and intra-host ones over ICI
(SURVEY.md §2.3/§5: distributed communication backend).

No TPU pod exists in this repo's CI, but the full multi-process mechanics
(rendezvous, cross-process collectives, sharded train step) are exercised
by a real two-process CPU run in tests/test_multihost2.py; the degenerate
single-process form is covered in tests/test_parallel.py.
"""
import jax

from .mesh import make_mesh


def init_distributed(coordinator_address=None, num_processes=None,
                     process_id=None):
    """Bootstrap the JAX distributed runtime (idempotent).

    With no arguments, jax.distributed.initialize() auto-discovers the
    cluster on TPU pods (GCE metadata). Pass explicit values for manual
    rendezvous: coordinator 'host:port', the world size, and this process'
    rank. The no-argument form is safe in single-process runs —
    initialization errors from an absent cluster are swallowed and the
    local backend is used. With EXPLICIT rendezvous parameters a failure
    re-raises: a typo'd coordinator or wrong world size must not silently
    degrade a pod job to independent single-process runs (ADVICE r2 low).
    """
    explicit = not (coordinator_address is None and num_processes is None)
    try:
        already = jax.distributed.is_initialized()
    except AttributeError:      # older jax: probe via global_state
        state = getattr(jax.distributed, 'global_state', None)
        already = getattr(state, 'client', None) is not None
    if not already:
        try:
            if explicit:
                # CPU multi-process needs a cross-process collectives
                # backend (gloo); on TPU pods the option is unused. Must
                # be set before the backend initializes.
                try:
                    jax.config.update(
                        'jax_cpu_collectives_implementation', 'gloo')
                except Exception:
                    pass        # older jax: no such option
                jax.distributed.initialize(
                    coordinator_address=coordinator_address,
                    num_processes=num_processes, process_id=process_id)
            else:
                jax.distributed.initialize()
        except (RuntimeError, ValueError):
            if explicit:
                raise
            pass  # single-process: local backend
    return jax.process_count(), jax.process_index()


def make_global_mesh(n_model=None):
    """('data', 'model') mesh over ALL processes' devices. Call
    init_distributed() first on pods. The 'model' (tensor-parallel) axis is
    kept within a host's chips by construction — jax.devices() orders
    devices host-major, and make_mesh folds the trailing axis into 'model' —
    so TP collectives ride ICI and only data-parallel gradient reductions
    cross DCN (the scaling-book layout recipe)."""
    return make_mesh(n_model=n_model, devices=jax.devices())
