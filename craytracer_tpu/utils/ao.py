"""Ambient-occlusion probe (AOTest, shading.h:16-24), batched: cast a
cosine-hemisphere shadow ray from each hit point and report the occluder
distance (TMAX = unoccluded)."""

from __future__ import annotations

import jax.numpy as jnp

from craytracer_tpu.core import math as vm
from craytracer_tpu.ops import shadow_distance
from craytracer_tpu.sampling.mappings import map_to_hemisphere_cosine


def ao_test(scene, hit_point, normal, u2, max_dist=None):
    t, b, n = vm.make_shading_frame(normal, jnp.zeros_like(normal).at[..., 0].set(1.0))
    wi = vm.to_world(map_to_hemisphere_cosine(u2), t, b, n)
    mag = jnp.max(jnp.abs(hit_point), axis=-1, keepdims=True)
    o = hit_point + normal * (mag + 1.0) * 1e-4
    return shadow_distance(scene, o, wi, max_dist)
