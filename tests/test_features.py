"""Feature tests: textures, env maps, normal maps, delta lights, noise."""

import jax.numpy as jnp
import numpy as np

from craytracer_tpu.camera import Film, make_camera
from craytracer_tpu.integrator.wavefront import render_sample, trace_paths
from craytracer_tpu.scene import SceneBuilder


def _head_on_rays(n, origin=(0, 0, 5), direction=(0, 0, -1)):
    o = jnp.tile(jnp.asarray([origin], jnp.float32), (n, 1))
    d = jnp.tile(jnp.asarray([direction], jnp.float32), (n, 1))
    return o, d, jnp.arange(n, dtype=jnp.uint32)


def test_diffuse_texture_drives_albedo():
    """A checkerboard diffuse texture on a rect: lanes landing on white vs
    black texels must return different NEE radiance."""
    b = SceneBuilder()
    checker = np.zeros((2, 2, 3), np.float32)
    checker[0, 0] = checker[1, 1] = 1.0
    tid = b.add_texture("checker", checker)
    b.add_matte("tex", (1, 0, 0), diffuse_tex=tid)
    # rect spanning x,y in [-1,1], uv = (x+1)/2 etc.
    b.add_rect((-1, -1, 0), (2, 0, 0), (0, 2, 0), "tex")
    b.set_env_light("constant", (1, 1, 1), 1.0)
    scene = b.build()

    # two lanes at uv (0.25, 0.25) and (0.75, 0.25). Reference texel
    # addressing (getTexColor: v flipped, round-half — texture.cpp:27-73):
    # uv (0.25,0.25) -> col round(0.5)=0, row round((1-0.25)*2)=1 ->
    # checker[1,0] = BLACK; uv (0.75,0.25) -> col 1, row 1 ->
    # checker[1,1] = WHITE.
    o = jnp.asarray([[-0.5, -0.5, 5.0], [0.5, -0.5, 5.0]], jnp.float32)
    d = jnp.asarray([[0, 0, -1], [0, 0, -1]], jnp.float32)
    ids = jnp.arange(2, dtype=jnp.uint32)
    L, good = trace_paths(scene, o, d, 0, ids, 0, 1)
    L = np.asarray(L)
    assert L[0].mean() < 0.05  # black texel
    assert L[1].mean() > 0.4  # white texel -> albedo 1 -> ~1.0


def test_env_map_texture_directional():
    """A lat-long env texture with a bright band at the horizon +z: mirror
    rays reflecting toward +z see the bright texel."""
    b = SceneBuilder()
    env = np.zeros((8, 16, 3), np.float32)
    # +z: theta = pi/2 -> row round(0.5*8) = 4; phi_ref = atan2(z=1, x=0)
    # + pi = 3pi/2 -> u = 0.75 -> col round(0.75*16) = 12
    # (reference conventions: util/math.h:95-107 + texture.cpp:27-73)
    env[4, 12] = (5.0, 5.0, 5.0)
    tid = b.add_texture("env", env)
    b.set_env_light("texture", intensity=1.0, tex_id=tid)
    b.add_matte("m", (0.5, 0.5, 0.5))
    b.add_sphere((100, 100, 100), 0.1, "m")  # something for bounds
    scene = b.build()

    from craytracer_tpu.lights.lights import env_radiance

    dirs = jnp.asarray([[0, 0, 1.0], [0, 0, -1.0], [0, 1, 0]], jnp.float32)
    li = np.asarray(env_radiance(scene.env, scene.textures, dirs))
    assert li[0].mean() > 4.0  # +z horizon: bright texel
    assert li[1].mean() < 0.1
    assert li[2].mean() < 0.1


def test_point_and_directional_lights():
    b = SceneBuilder()
    b.add_matte("m", (0.8, 0.8, 0.8))
    b.add_rect((-10, 0, -10), (20, 0, 0), (0, 0, 20), "m")  # floor, +y normal
    b.add_point_light((0, 5, 0), (1, 1, 1), intensity=25.0, dist_atten=True)
    scene = b.build()
    o, d, ids = _head_on_rays(64, (0, 5, 5))
    d = jnp.tile(jnp.asarray([[0.0, -0.7071, -0.7071]], jnp.float32), (64, 1))
    L, good = trace_paths(scene, o, d, 0, ids, 0, 2)
    assert float(np.asarray(L).mean()) > 0.01  # lit by the point light

    b2 = SceneBuilder()
    b2.add_matte("m", (0.8, 0.8, 0.8))
    b2.add_rect((-10, 0, -10), (20, 0, 0), (0, 0, 20), "m")
    b2.add_directional_light((0, 1, 0), (1, 1, 1), intensity=2.0)
    scene2 = b2.build()
    L2, _ = trace_paths(scene2, o, d, 0, ids, 0, 2)
    # wi straight up, Li = 2, f = 0.8/pi, cos = 1 -> first-vertex NEE =
    # 2 * 0.8/pi ~ 0.51 (plus one indirect bounce)
    m = float(np.asarray(L2).mean())
    assert 0.4 < m < 1.2, m


def test_normal_map_changes_shading():
    b = SceneBuilder()
    # constant normal map tilting normals 45 deg toward +x (tangent axis)
    half = np.float32(np.sqrt(0.5))
    nm = np.full((2, 2, 3), 0.0, np.float32)
    nm[..., 0] = (half + 1.0) / 2.0  # encode x = sqrt(.5)
    nm[..., 1] = 0.5  # y = 0
    nm[..., 2] = (half + 1.0) / 2.0  # z = sqrt(.5)
    tid = b.add_texture("nm", nm)
    b.add_matte("flat", (0.8, 0.8, 0.8))
    b.add_matte("mapped", (0.8, 0.8, 0.8), normal_tex=tid)
    b.add_rect((-10, 0, -10), (20, 0, 0), (0, 0, 20), "flat")
    b.add_directional_light((0, 1, 0), (1, 1, 1), intensity=2.0)
    s_flat = b.build()
    mapped = s_flat.replace(
        rects=s_flat.rects.replace(mat_id=jnp.full_like(s_flat.rects.mat_id, 2))
    )
    o, d, ids = _head_on_rays(16, (0, 5, 5))
    d = jnp.tile(jnp.asarray([[0.0, -0.7071, -0.7071]], jnp.float32), (16, 1))
    L_flat, _ = trace_paths(s_flat, o, d, 0, ids, 0, 1)
    L_map, _ = trace_paths(mapped, o, d, 0, ids, 0, 1)
    # tilted normal -> cos with straight-up light drops by ~cos(45)
    ratio = float(np.asarray(L_map).mean() / np.asarray(L_flat).mean())
    assert 0.55 < ratio < 0.9, ratio


def test_noise_ranges_and_smoothness():
    from craytracer_tpu.utils.noise import fbm, turbulence, value_noise_cubic, value_noise_linear

    rng = np.random.default_rng(0)
    p = jnp.asarray(rng.uniform(-10, 10, (4096, 3)), jnp.float32)
    n_lin = np.asarray(value_noise_linear(p))
    n_cub = np.asarray(value_noise_cubic(p))
    assert n_lin.min() >= -1.0 and n_lin.max() <= 1.0
    assert n_cub.min() >= -1.0 and n_cub.max() <= 1.0
    assert n_lin.std() > 0.1  # actually varies
    t = np.asarray(turbulence(p))
    assert t.min() >= 0.0 and t.max() <= 1.0
    f = np.asarray(fbm(p))
    assert f.min() >= 0.0 and f.max() <= 1.0
    # continuity: tiny displacement -> tiny change
    eps_p = p + 1e-4
    d = np.abs(np.asarray(value_noise_linear(eps_p)) - n_lin)
    assert d.max() < 0.01
