"""First-hit AOV (arbitrary output variable) rendering.

Beyond the reference (which only outputs beauty PPM/imagestate): normal /
depth / albedo / uv buffers from one deterministic camera-centered
intersection pass — the standard inputs for denoisers and for debugging
inverse-rendering setups. Written as linear EXR by render.py --aov."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from craytracer_tpu.constants import TMAX

AOV_NAMES = ("normal", "depth", "albedo", "uv")


@jax.jit
def render_aovs(scene, camera, film):
    """dict of [num_pixels, 3] f32 AOVs from pixel-center camera rays:

    - normal: shading normal (world), zero on miss
    - depth:  hit distance t in all channels, zero on miss
    - albedo: texture-resolved material color at the hit, zero on miss
    - uv:     surface parameterization (u, v, 0)
    """
    from craytracer_tpu.bsdf.bxdf import gather_params
    from craytracer_tpu.camera import generate_rays
    from craytracer_tpu.ops.intersect import intersect_scene

    ids = jnp.arange(film.num_pixels, dtype=jnp.int32)
    o, d = generate_rays(camera, film, ids, jnp.full((film.num_pixels, 2), 0.5))
    hit = intersect_scene(scene, o, d)
    miss = (hit.group < 0) | (hit.t >= TMAX)
    ok = (~miss)[:, None]

    mp = gather_params(scene.materials, scene.textures, hit.mat_id, hit.uv,
                       lambertian_only=scene.matte_lambertian)
    zero = jnp.zeros((film.num_pixels, 3), jnp.float32)
    return {
        "normal": jnp.where(ok, hit.normal, zero),
        "depth": jnp.where(ok, hit.t[:, None].repeat(3, axis=1), zero),
        "albedo": jnp.where(ok, mp.color, zero),
        "uv": jnp.where(
            ok, jnp.concatenate([hit.uv, zero[:, :1]], axis=1), zero),
    }
