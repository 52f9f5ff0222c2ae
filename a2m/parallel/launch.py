"""Multi-process runtime bootstrap (``jax.distributed``).

The reference has no communication backend at all — training is one process
on one GPU (`version5_model_train.py:256-282`).  The TPU-native scaling
story (SURVEY.md §2.5) is: bring up the distributed runtime with
``jax.distributed.initialize`` so every host sees the GLOBAL device set,
build one :class:`jax.sharding.Mesh` over those devices, and let GSPMD
insert the collectives.  This module is the bring-up half; the mesh/
sharding half lives in :mod:`a2m.parallel.mesh`.

Launch recipe (one command per host, identical except ``process_id``)::

    A2M_COORDINATOR=host0:8476 A2M_NUM_PROCESSES=2 A2M_PROCESS_ID=$i \
        python -m a2m.train mesh.data=-1 data.batch_size=64

``data.batch_size`` is PER PROCESS; the global batch is ``batch_size x
num_processes``.  The loader automatically feeds each process a disjoint,
LPT-balanced interval slice (``a2m.parallel.mesh.balanced_host_slices``)
with equal per-epoch step counts, so hosts never desync at a collective.

MUST run before any jax backend use (the first ``jax.devices()`` /
computation locks the platform topology).
"""

from __future__ import annotations

import os

__all__ = ['host_barrier', 'is_distributed', 'maybe_initialize',
           'sync_global_moments']

_INITIALIZED = False


def _env_int(name: str, default: int) -> int:
    v = os.environ.get(name, '')
    return int(v) if v else default


def maybe_initialize(dist_cfg=None) -> bool:
    """Bring up ``jax.distributed`` when configured; no-op otherwise.

    Resolution order: explicit ``DistConfig`` fields, then the
    ``A2M_COORDINATOR`` / ``A2M_NUM_PROCESSES`` / ``A2M_PROCESS_ID`` env
    vars, then (``dist.auto``) jax's own TPU-pod autodetection.  Returns
    True iff the distributed runtime is (now) active.  Idempotent — a
    second call returns the current state without re-initializing.
    """
    global _INITIALIZED
    if _INITIALIZED:
        return True
    coordinator = (getattr(dist_cfg, 'coordinator', '')
                   or os.environ.get('A2M_COORDINATOR', ''))
    auto = bool(getattr(dist_cfg, 'auto', False))
    if not coordinator and not auto:
        return False

    import jax
    if coordinator:
        num_processes = (getattr(dist_cfg, 'num_processes', 0)
                         or _env_int('A2M_NUM_PROCESSES', 0))
        process_id = getattr(dist_cfg, 'process_id', -1)
        if process_id < 0:
            process_id = _env_int('A2M_PROCESS_ID', -1)
        if num_processes <= 0 or process_id < 0:
            raise ValueError(
                'dist.coordinator set but num_processes/process_id are '
                'not: pass dist.num_processes=N dist.process_id=I or set '
                'A2M_NUM_PROCESSES / A2M_PROCESS_ID')
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)
    else:                       # TPU pod: runtime supplies the topology
        jax.distributed.initialize()
    _INITIALIZED = True
    return True


def is_distributed() -> bool:
    """True when this process is part of a multi-process jax runtime."""
    import jax
    return jax.process_count() > 1


def _coordination_client():
    """The distributed-runtime coordination client (None single-process).

    Private jax surface (``jax._src.distributed``) — the public API exposes
    only initialize/shutdown; the coordination KV store + barriers are how
    jax itself sequences multi-host startup, and they carry configurable
    long timeouts, unlike Gloo's hard 30 s context-init deadline.
    """
    from jax._src import distributed
    return distributed.global_state.client


def host_barrier(name: str, timeout_s: float = 1800.0) -> None:
    """Align all processes at ``name`` via the coordination service.

    Used to bracket each jitted step's FIRST execution: per-process compile
    times can differ by minutes (cold persistent cache, CPU contention),
    and a process entering a Gloo collective >30 s before its peers dies
    on Gloo's context-init deadline (observed in the 2-process CPU
    integration run).  Compile first (AOT), then barrier, then execute —
    all processes create the Gloo context within milliseconds of each
    other."""
    import jax
    if jax.process_count() == 1:
        return
    client = _coordination_client()
    if client is None:
        return
    client.wait_at_barrier(name, timeout_in_ms=int(timeout_s * 1000))


def sync_global_moments(mean_sum, sq_sum, batch_num: int):
    """All-reduce per-host normalization moments to dataset-global stats.

    Each host computes moments over ITS interval slice
    (:func:`a2m.data.normalization.get_moments_necksub`); summing
    ``(mean_sum, sq_sum, batch_num)`` across hosts reproduces exactly the
    single-process statistics (the reference's batch-mean-of-moments
    estimator, normalization_tools.py:24-45, is a plain sum over batches).

    The exchange rides the coordination-service KV store (DCN, long
    timeouts), NOT a device collective: it happens during startup where
    per-host timing skew is at its worst and Gloo/ICI contexts may not be
    establishable yet.  Runs once, ~2x104 float64 per host.
    """
    import json

    import jax
    import numpy as np
    mean_sum = np.asarray(mean_sum, np.float64)
    sq_sum = np.asarray(sq_sum, np.float64)
    if jax.process_count() == 1:
        return mean_sum, sq_sum, batch_num
    client = _coordination_client()
    pid = jax.process_index()
    client.key_value_set(
        f'a2m/moments/{pid}',
        json.dumps([mean_sum.tolist(), sq_sum.tolist(), float(batch_num)]))
    total_m = np.zeros_like(mean_sum)
    total_s = np.zeros_like(sq_sum)
    total_n = 0.0
    for p in range(jax.process_count()):
        m, s, n = json.loads(client.blocking_key_value_get(
            f'a2m/moments/{p}', 1800 * 1000))
        total_m += np.asarray(m)
        total_s += np.asarray(s)
        total_n += n
    return total_m, total_s, total_n
