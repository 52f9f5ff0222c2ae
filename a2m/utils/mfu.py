"""Model-FLOPs-utilization accounting for jitted steps.

The reference has no performance accounting at all (SURVEY.md §5: prints +
tqdm).  Here every jitted step can report its compiled FLOP count straight
from XLA's cost model, and the trainer turns (flops, wall-time) into an MFU
figure against the chip's peak.

Peak numbers are the published per-chip specs; f32 matmuls on TPU v5e run
through the MXU at 1/4 the bf16 rate.
"""

from __future__ import annotations

import jax

#: published per-chip peak matmul throughput (FLOP/s)
PEAK_FLOPS = {
    ('tpu v5 lite', 'bf16'): 197e12,
    ('tpu v5 lite', 'f32'): 49.2e12,
    ('cpu', 'bf16'): 1e11,      # arbitrary CPU reference, keeps tests finite
    ('cpu', 'f32'): 1e11,
}


def device_kind() -> str:
    kind = jax.devices()[0].device_kind.lower()
    return 'tpu v5 lite' if 'v5 lite' in kind or 'v5e' in kind else kind


def peak_flops(dtype: str = 'bf16') -> float:
    return PEAK_FLOPS.get((device_kind(), dtype), 197e12)


def compiled_flops(jitted_fn, *args, **kwargs) -> float | None:
    """FLOPs of the step from XLA's HLO cost analysis, with a
    backend-independent jaxpr fallback.

    ``Lowered.cost_analysis()`` is a client-side analysis of the traced
    HLO, so it never triggers a device compile (important on remote-compile
    backends where compiles cost minutes).  Some backends (e.g. the axon
    TPU tunnel) expose no cost model at all — then the traced jaxpr's
    dot/conv primitives are counted directly.
    """
    try:
        lowered = jitted_fn.lower(*args, **kwargs)
        cost = lowered.cost_analysis()
        if isinstance(cost, list):           # some backends: one per device
            cost = cost[0] if cost else None
        flops = (cost or {}).get('flops', None)
        if flops and flops > 0:
            return float(flops)
    except Exception:
        pass
    try:
        jaxpr = jitted_fn.trace(*args, **kwargs).jaxpr
        return jaxpr_flops(jaxpr)
    except Exception:
        return None


def _dot_flops(eqn) -> float:
    (lc, rc), (lb, rb) = eqn.params['dimension_numbers']
    a, b = eqn.invars[0].aval, eqn.invars[1].aval
    batch = 1.0
    for d in lb:
        batch *= a.shape[d]
    k = 1.0
    for d in lc:
        k *= a.shape[d]
    m = 1.0
    for d in range(len(a.shape)):
        if d not in lc and d not in lb:
            m *= a.shape[d]
    n = 1.0
    for d in range(len(b.shape)):
        if d not in rc and d not in rb:
            n *= b.shape[d]
    return 2.0 * batch * m * n * k


def _conv_flops(eqn) -> float:
    out = eqn.outvars[0].aval
    kernel = eqn.invars[1].aval
    dn = eqn.params['dimension_numbers']
    k_spatial = 1.0
    for d in dn.rhs_spec[2:]:
        k_spatial *= kernel.shape[d]
    # kernel's in-channel dim is already per-group, and out_elems already
    # spans all output channels, so no groups factor is needed
    cin_per_group = kernel.shape[dn.rhs_spec[1]]
    out_elems = 1.0
    for s in out.shape:
        out_elems *= s
    return 2.0 * out_elems * k_spatial * cin_per_group


def jaxpr_flops(jaxpr) -> float:
    """Matmul/conv FLOPs of a (closed) jaxpr, recursing into sub-jaxprs.

    Elementwise ops are ignored (they are >100x cheaper on this model
    family); scan bodies are multiplied by trip count.
    """
    closed = getattr(jaxpr, 'jaxpr', None)
    eqns = jaxpr.eqns if closed is None else closed.eqns
    total = 0.0
    for eqn in eqns:
        name = eqn.primitive.name
        if name == 'dot_general':
            total += _dot_flops(eqn)
        elif name == 'conv_general_dilated':
            total += _conv_flops(eqn)
        else:
            mult = eqn.params.get('length', 1) if name == 'scan' else 1
            for p in eqn.params.values():
                if hasattr(p, 'eqns') or hasattr(p, 'jaxpr'):
                    total += mult * jaxpr_flops(p)
                elif isinstance(p, (tuple, list)):
                    for q in p:
                        if hasattr(q, 'eqns') or hasattr(q, 'jaxpr'):
                            total += mult * jaxpr_flops(q)
    return total


def mfu(flops_per_step: float, step_seconds: float,
        dtype: str = 'bf16') -> float:
    """Achieved fraction of peak: (flops/step) / (peak * step_time)."""
    if not flops_per_step or step_seconds <= 0:
        return 0.0
    return flops_per_step / (peak_flops(dtype) * step_seconds)


def format_mfu_line(name: str, flops_per_step: float | None,
                    step_seconds: float, dtype: str = 'bf16') -> str:
    if flops_per_step is None:
        return (f'{name}: {step_seconds * 1e3:.1f} ms/step '
                f'(no XLA cost model on this backend)')
    tf = flops_per_step / 1e12
    achieved = flops_per_step / step_seconds / 1e12
    return (f'{name}: {step_seconds * 1e3:.1f} ms/step, {tf:.2f} TFLOP, '
            f'{achieved:.1f} TFLOP/s achieved, '
            f'MFU {100 * mfu(flops_per_step, step_seconds, dtype):.1f}% '
            f'({dtype} peak {peak_flops(dtype) / 1e12:.0f} TF/s)')
