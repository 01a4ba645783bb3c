"""Shared activation math used by both the XLA codec path
(models/dac/conv.py) and the Pallas kernels (ops/pallas/res_stack.py).

sin2_poly approximates sin(z)^2, the transcendental inside the S1-DAC
snake activation (reference: autoencoder.py:96-109).  The decoder is
bound by the VPU sin at the published config (~45 ms of the 176 ms
decode, docs/PERFORMANCE.md §3); the polynomial needs ~8 VPU ops instead
of the full sin lowering (large-argument range reduction + degree-9
polynomial).  Opt-in via DACConfig.snake_approx; default stays exact.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# Degree-4 near-minimax polynomial for sin^2(pi*u) = v*P(v), v = u^2,
# u in [-1/2, 1/2]; max abs error 1.6e-6 over the full period — far below
# bf16 resolution (~4e-3 relative).  sin^2 has period pi and is even, so
# the range reduction is a single round: u = z/pi - round(z/pi).
SIN2_COEFFS = (9.869597907896603, -32.46839063007976, 42.686220577408491,
               -29.642546184449031, 10.952207549847412)

# Cody-Waite split of pi: PI_HI has 12 mantissa bits, so k*PI_HI is exact
# in f32 for |k| <= 2^12 — keeping the reduction error ~1e-7 out to
# |z| ~ 1e4 instead of the ~1e-4 a naive single-multiply reduction hits.
_PI_HI = np.float32(3.140625)
_PI_LO = np.float32(np.pi - 3.140625)


def sin2_poly(z: jnp.ndarray) -> jnp.ndarray:
    """sin(z)^2 via range-reduced degree-4 polynomial (f32 math)."""
    z = z.astype(jnp.float32)
    k = jnp.round(z * jnp.float32(1.0 / np.pi))
    r = (z - k * _PI_HI) - k * _PI_LO      # r in ~[-pi/2, pi/2]
    u = r * jnp.float32(1.0 / np.pi)       # u in ~[-1/2, 1/2]
    v = u * u
    c = SIN2_COEFFS
    p = c[0] + v * (c[1] + v * (c[2] + v * (c[3] + v * c[4])))
    return v * p
