"""Accurate elementwise transcendentals for TPU.

The TPU VPU's native ``log`` is a fast approximation with ~1e-4 absolute
error — two orders of magnitude too coarse for the frontend parity target
(<=1e-5 rel-err log-mel features vs the float64 golden).  ``precise_log``
reimplements natural log at <=2e-6 absolute error using exponent extraction
(bitcast) + a 2*atanh((m-1)/(m+1)) odd series + a hi/lo-split ln2, all
VPU-friendly elementwise ops that work identically inside Pallas kernels.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

# ln(2) split so that e * LN2_HI is exact for |e| < 2^10
_LN2_HI = np.float32(0.69314575195)   # bits: 0x3f317200
_LN2_LO = np.float32(1.4286068203e-06)
_SQRT2 = np.float32(1.4142135624)


def precise_log(x: jnp.ndarray) -> jnp.ndarray:
    """Natural log for positive, finite, normal float32 inputs.

    abs error <= ~2e-6 over [1e-12, 1e12] (vs ~1e-4 for TPU-native log).
    Not IEEE-complete: no NaN/inf/subnormal handling — inputs in this
    codebase are clamped to a positive floor first.
    """
    x = x.astype(jnp.float32)
    xi = lax.bitcast_convert_type(x, jnp.int32)
    e = ((xi >> 23) & 0xFF) - 127
    m = lax.bitcast_convert_type((xi & 0x007FFFFF) | (127 << 23), jnp.float32)
    # shift mantissa into [sqrt(1/2), sqrt(2)) so |r| <= 3 - 2*sqrt(2) ~ 0.1716
    adjust = m > _SQRT2
    m = jnp.where(adjust, m * 0.5, m)
    e = (e + adjust.astype(jnp.int32)).astype(jnp.float32)
    # log(m) = 2*atanh(r), r = (m-1)/(m+1); Sterbenz: m-1 is exact here
    r = (m - 1.0) / (m + 1.0)
    r2 = r * r
    poly = 2.0 * r * (1.0 + r2 * (np.float32(1 / 3) + r2 * (
        np.float32(0.2) + r2 * (np.float32(1 / 7) + r2 * np.float32(1 / 9)))))
    return e * _LN2_HI + (e * _LN2_LO + poly)


def precise_sqrt(x: jnp.ndarray) -> jnp.ndarray:
    """sqrt with one Newton refinement on top of the hardware rsqrt.

    XLA's f32 sqrt on TPU is usually adequate; this pins accuracy for the
    magnitude (power=1) spectrogram paths regardless of backend lowering.
    """
    x = x.astype(jnp.float32)
    y = lax.rsqrt(jnp.maximum(x, jnp.float32(1e-30)))
    # one Newton step for rsqrt: y' = y * (1.5 - 0.5 x y^2)
    y = y * (1.5 - 0.5 * x * y * y)
    s = x * y
    # one Heron step for sqrt: s' = 0.5 * (s + x / s) via fused form
    s = 0.5 * (s + x * y)
    return jnp.where(x > 0, s, 0.0)
