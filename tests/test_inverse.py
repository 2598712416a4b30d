"""Inverse rendering: recover material parameters by gradient descent
through the full wavefront tracer (the BASELINE.json inverse-rendering
config, scaled down)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from craytracer_tpu.camera import Film, make_camera
from craytracer_tpu.integrator.wavefront import render_sample
from craytracer_tpu.scene import SceneBuilder


def _scene(albedo):
    b = SceneBuilder()
    b.add_matte("floor", (albedo, albedo * 0.8, albedo * 0.5))
    b.add_emissive("light", (1, 1, 1), 25.0)
    b.add_rect((-20, 0, -20), (40, 0, 0), (0, 0, 40), "floor")
    b.add_rect((-3, 20, -3), (6, 0, 0), (0, 0, 6), "light")
    return b.build()


def test_recover_albedo():
    target_albedo = 0.7
    scene_target = _scene(target_albedo)
    cam = make_camera((0, 10, 25), (0, 0, 0))
    film = Film(fov=jnp.float32(np.radians(40.0)), width=16, height=16)
    ids = jnp.arange(film.num_pixels, dtype=jnp.int32)

    def render(scene, spp_index):
        return render_sample(scene, cam, film, ids, 7, spp_index, 2,
                             estimator="physical")

    target = render(scene_target, 0)

    scene0 = _scene(0.25)  # wrong initial albedo

    def loss_fn(color_row, spp_index):
        s = scene0.replace(materials=scene0.materials.replace(
            color=scene0.materials.color.at[1].set(color_row)))
        img = render(s, spp_index)
        return jnp.mean((img - target) ** 2)

    params = scene0.materials.color[1]
    opt = optax.adam(0.05)
    opt_state = opt.init(params)
    step = jax.jit(jax.value_and_grad(loss_fn))

    losses = []
    for it in range(40):
        loss, g = step(params, it % 4)
        updates, opt_state = opt.update(g, opt_state)
        params = optax.apply_updates(params, updates)
        params = jnp.clip(params, 0.0, 1.0)
        losses.append(float(loss))

    recovered = np.asarray(params)
    expected = np.array([0.7, 0.56, 0.35])
    np.testing.assert_allclose(recovered, expected, atol=0.05)
    assert losses[-1] < losses[0] * 0.3  # MC noise floor from per-step RNG streams


def test_recover_texture():
    """Recover a 4x4 texture through the nearest-lookup gather (the
    BASELINE inverse config's 'texture' parameter class)."""
    target_tex = np.linspace(0.15, 0.85, 4 * 4 * 3,
                             dtype=np.float32).reshape(4, 4, 3)

    def build(tex):
        b = SceneBuilder()
        tid = b.add_texture("t", tex)
        b.add_matte("floor", (1, 1, 1), diffuse_tex=tid)
        b.add_emissive("light", (1, 1, 1), 25.0)
        b.add_rect((-20, 0, -20), (40, 0, 0), (0, 0, 40), "floor")
        b.add_rect((-3, 20, -3), (6, 0, 0), (0, 0, 6), "light")
        return b.build()

    scene_t = build(target_tex)
    cam = make_camera((0, 18, 20), (0, 0, 0))
    film = Film(fov=jnp.float32(np.radians(55.0)), width=24, height=24)
    ids = jnp.arange(film.num_pixels, dtype=jnp.int32)

    def render(scene, spp_index):
        return render_sample(scene, cam, film, ids, 7, spp_index, 2,
                             estimator="physical")

    target = jnp.stack([render(scene_t, k) for k in range(4)]).mean(0)

    scene0 = build(np.full((4, 4, 3), 0.5, np.float32))

    def loss_fn(texels, spp_index):
        s = scene0.replace(textures=scene0.textures.replace(texels=texels))
        img = jnp.stack([render(s, spp_index * 4 + k) for k in range(4)]).mean(0)
        return jnp.mean((img - target) ** 2)

    params = scene0.textures.texels
    opt = optax.adam(0.05)
    opt_state = opt.init(params)
    step = jax.jit(jax.value_and_grad(loss_fn))
    for it in range(60):
        loss, g = step(params, it % 4)
        updates, opt_state = opt.update(g, opt_state)
        params = optax.apply_updates(params, updates)
        params = jnp.clip(params, 0.0, 1.0)

    rec = np.asarray(params).reshape(4, 4, 3)
    err = np.abs(rec - target_tex)
    # texels the camera actually sees converge; tolerate a few edge texels
    assert np.median(err) < 0.06, np.median(err)
    assert (err < 0.12).mean() > 0.75, err.mean()


def test_inverse_driver_checkpoint_resume(tmp_path):
    """InverseRenderer: 3 steps + save + load + 3 steps must equal 6
    straight steps bit-for-bit (params AND optimizer moments)."""
    from craytracer_tpu.inverse import InverseConfig, InverseRenderer

    scene_target = _scene(0.7)
    cam = make_camera((0, 10, 25), (0, 0, 0))
    film = Film(fov=jnp.float32(np.radians(40.0)), width=8, height=8)
    ids = jnp.arange(film.num_pixels, dtype=jnp.int32)
    target = render_sample(scene_target, cam, film, ids, 7, 0, 2,
                           estimator="physical")

    scene0 = _scene(0.25)
    params0 = scene0.materials.color[1]

    def apply_fn(scene, p):
        return scene.replace(materials=scene.materials.replace(
            color=scene.materials.color.at[1].set(p)))

    cfg = InverseConfig(learning_rate=0.05, max_depth=2)

    def fresh():
        return InverseRenderer(scene0, cam, film, target, params0,
                               apply_fn, cfg, seed=7)

    a = fresh()
    for _ in range(6):
        a.step()

    b = fresh()
    for _ in range(3):
        b.step()
    ck = str(tmp_path / "inv.pkl")
    b.save_state(ck)

    c = fresh()
    c.load_state(ck)
    assert c.step_idx == 3
    for _ in range(3):
        c.step()

    np.testing.assert_array_equal(np.asarray(a.params), np.asarray(c.params))
    for la, lc in zip(jax.tree_util.tree_leaves(a.opt_state),
                      jax.tree_util.tree_leaves(c.opt_state)):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lc))
    # grad norms observable and finite
    assert all(np.isfinite(g) for _, g in a.history)

    # seed mismatch must refuse to resume (mixing RNG streams)
    import pytest as _pytest

    d = InverseRenderer(scene0, cam, film, target, params0, apply_fn, cfg,
                        seed=8)
    with _pytest.raises(ValueError):
        d.load_state(ck)
