"""Microfacet distributions (Beckmann + Trowbridge-Reitz), vectorized.

Re-implements `microfacet.cpp:4-141` over `[N]` batches of local-frame
directions with per-lane (alphax, alphay, distrib-type) parameters; the
type switch becomes a `where` select, so mixed-material hit queues evaluate
in one pass.
"""

from __future__ import annotations

import jax.numpy as jnp

from craytracer_tpu.constants import PI, TWO_PI
from craytracer_tpu.core import math as vm
from craytracer_tpu.scene.types import DIST_BECKMANN


def _clamp_alpha(a):
    # alpha 0 belongs to delta lobes; non-microfacet lanes carry 0 through
    # the masked evaluation and would divide by zero (NaN gradients)
    return jnp.maximum(a, 1e-4)


def distribution_d(wh, ax, ay, dist):
    """D(wh) (microfacet.cpp:4-31)."""
    ax = _clamp_alpha(ax)
    ay = _clamp_alpha(ay)
    t2 = vm.tan2_theta(wh)
    c4 = vm.cos2_theta(wh) ** 2
    c2p = vm.cos2_phi(wh)
    s2p = vm.sin2_phi(wh)
    finite = jnp.isfinite(t2) & (c4 > 1e-16)
    # double-where: sanitize the INPUTS of the masked lanes too, or the
    # backward pass differentiates the inf/0 expressions and turns the
    # masked zeros into NaN gradients (d(loss)/d(alpha) tests)
    t2 = jnp.where(finite, t2, 0.0)
    c4 = jnp.where(finite, c4, 1.0)

    d_beck = jnp.exp(-t2 * (c2p / (ax * ax) + s2p / (ay * ay))) / (
        PI * ax * ay * c4
    )
    e = (c2p / (ax * ax) + s2p / (ay * ay)) * t2
    d_tr = 1.0 / (PI * ax * ay * c4 * (1.0 + e) ** 2)
    d = jnp.where(dist == DIST_BECKMANN, d_beck, d_tr)
    return jnp.where(finite, d, 0.0)


def distribution_lambda(w, ax, ay, dist):
    """Lambda(w) (microfacet.cpp:33-66); Beckmann uses the rational
    approximation with the a >= 1.6 cutoff."""
    ax = _clamp_alpha(ax)
    ay = _clamp_alpha(ay)
    abs_tan = jnp.abs(vm.tan_theta(w))
    finite = jnp.isfinite(abs_tan)
    abs_tan = jnp.where(finite, abs_tan, 0.0)  # double-where (see D above)
    # the 1e-12 floor keeps sqrt off 0 for ZERO input vectors (their
    # cos2_phi+sin2_phi can be 0): d sqrt(0)/d ax = NaN even on lanes a
    # later where() discards (the where-NaN-VJP trap)
    alpha = jnp.sqrt(jnp.maximum(
        vm.cos2_phi(w) * ax * ax + vm.sin2_phi(w) * ay * ay, 1e-12))
    a = 1.0 / jnp.maximum(alpha * abs_tan, 1e-16)
    # the rational branch is only used for a < 1.6, but it is EVALUATED for
    # all lanes: at a ~ 1e16 its quotient-rule denominator overflows f32 to
    # inf in the backward pass and 0 * inf = NaN gradients — clamp the
    # branch input (double-where)
    a_c = jnp.minimum(a, 1.6)
    lam_beck = jnp.where(
        a >= 1.6,
        0.0,
        (1.0 - 1.259 * a_c + 0.396 * a_c * a_c)
        / (3.535 * a_c + 2.181 * a_c * a_c),
    )
    a2t2 = (alpha * abs_tan) ** 2
    lam_tr = (-1.0 + jnp.sqrt(1.0 + a2t2)) / 2.0
    lam = jnp.where(dist == DIST_BECKMANN, lam_beck, lam_tr)
    return jnp.where(finite, lam, 0.0)


def distribution_g1(w, ax, ay, dist):
    return 1.0 / (1.0 + distribution_lambda(w, ax, ay, dist))


def distribution_g(wo, wi, ax, ay, dist):
    return 1.0 / (
        1.0 + distribution_lambda(wo, ax, ay, dist) + distribution_lambda(wi, ax, ay, dist)
    )


def sample_wh(wo, u, ax, ay, dist):
    """Sample a half-vector (microfacet.cpp:77-135). The reference only
    implements the Beckmann inversion and uses it for both types; we add the
    proper TR inversion for the TR path (unreachable from reference scenes,
    which always build BECKMANN)."""
    ax = _clamp_alpha(ax)
    ay = _clamp_alpha(ay)
    log_u = jnp.log(jnp.maximum(u[..., 0], 1e-30))
    log_u = jnp.where(jnp.isfinite(log_u), log_u, 0.0)

    iso = ax == ay
    # Isotropic Beckmann
    t2_iso = -ax * ax * log_u
    phi_iso = u[..., 1] * TWO_PI
    # Anisotropic Beckmann
    phi_an = jnp.arctan(ay / ax * jnp.tan(TWO_PI * u[..., 1] + 0.5 * PI))
    phi_an = jnp.where(u[..., 1] > 0.5, phi_an + PI, phi_an)
    sp, cp = jnp.sin(phi_an), jnp.cos(phi_an)
    t2_an = -log_u / (cp * cp / (ax * ax) + sp * sp / (ay * ay))
    t2_beck = jnp.where(iso, t2_iso, t2_an)
    phi = jnp.where(iso, phi_iso, phi_an)

    # TR isotropic inversion: tan2 = a^2 u / (1 - u)
    t2_tr = ax * ax * u[..., 0] / jnp.maximum(1.0 - u[..., 0], 1e-7)
    t2 = jnp.where(dist == DIST_BECKMANN, t2_beck, t2_tr)

    cos_t = 1.0 / jnp.sqrt(1.0 + t2)
    sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 1e-12))
    wh = vm.spherical_direction(sin_t, cos_t, phi)
    flip = ~vm.same_hemisphere(wo, wh)
    return jnp.where(flip[..., None], -wh, wh)


def distribution_pdf(wo, wh, ax, ay, dist):
    """pdf(wh) = D(wh) |cos(theta_h)| (microfacet.cpp:137-141)."""
    return distribution_d(wh, ax, ay, dist) * vm.abs_cos_theta(wh)
