"""Tone mapping (toneMap, shading.h:33-63): exponential exposure -2 then
gamma 2.2, matching the reference's display/output transform."""

from __future__ import annotations

import jax.numpy as jnp


def tone_map(color, exposure: float = -2.0, gamma: float = 2.2):
    r = 1.0 - jnp.exp(color * exposure)
    return jnp.power(jnp.maximum(r, 0.0), 1.0 / gamma)
