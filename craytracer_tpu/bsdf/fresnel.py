"""Fresnel terms, vectorized (reference reflection.cpp:52-157).

Both functions take cos(theta_i) measured against the normal on the incident
side handling (sign flips are internal, as in calcFresnelDielectric).
"""

from __future__ import annotations

import jax.numpy as jnp


def fr_dielectric(cos_theta_i, eta_t, eta_i):
    """Unpolarized dielectric Fresnel reflectance.

    Mirrors calcFresnelDielectric(normal, wo, etaT, etaI)
    (reflection.cpp:52-76): when cos_theta_i < 0 the two IORs swap and the
    angle is flipped. Total internal reflection returns 1."""
    flip = cos_theta_i < 0.0
    ei = jnp.where(flip, eta_t, eta_i)
    et = jnp.where(flip, eta_i, eta_t)
    ci = jnp.abs(cos_theta_i)
    sin_i = jnp.sqrt(jnp.maximum(1.0 - ci * ci, 1e-12))
    sin_t = ei / et * sin_i
    tir = sin_t >= 1.0
    ct = jnp.sqrt(jnp.maximum(1.0 - sin_t * sin_t, 1e-12))
    r_parl = (et * ci - ei * ct) / jnp.maximum(et * ci + ei * ct, 1e-12)
    r_perp = (ei * ci - et * ct) / jnp.maximum(ei * ci + et * ct, 1e-12)
    fr = 0.5 * (r_parl * r_parl + r_perp * r_perp)
    return jnp.where(tir, 1.0, fr)


def fr_conductor(cos_theta_i, eta_t, eta_i, k):
    """RGB conductor Fresnel (calcFresnelConductor, reflection.cpp:78-157;
    PBRT formulation). `eta_t`, `eta_i`, `k` are [..., 3]; cos_theta_i [...]."""
    c = jnp.clip(cos_theta_i, -1.0, 1.0)[..., None]
    eta = eta_t / eta_i
    etak = k / eta_i
    c2 = c * c
    s2 = 1.0 - c2
    eta2 = eta * eta
    etak2 = etak * etak
    t0 = eta2 - etak2 - s2
    a2b2 = jnp.sqrt(jnp.maximum(t0 * t0 + 4.0 * eta2 * etak2, 1e-12))
    t1 = a2b2 + c2
    a = jnp.sqrt(jnp.maximum(0.5 * (a2b2 + t0), 1e-12))
    t2 = 2.0 * c * a
    rs = (t1 - t2) / jnp.maximum(t1 + t2, 1e-12)
    t3 = c2 * a2b2 + s2 * s2
    t4 = t2 * s2
    rp = rs * (t3 - t4) / jnp.maximum(t3 + t4, 1e-12)
    return 0.5 * (rp + rs)


def schlick_fresnel(cos_theta, rs):
    """Schlick approximation (reflection.cpp:466-482); rs is [..., 3]."""
    p5 = (1.0 - cos_theta) ** 5
    return rs + p5[..., None] * (1.0 - rs)
