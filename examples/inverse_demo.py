"""Inverse-rendering demo: recover wall + sphere albedos from a target
image by gradient descent through the wavefront tracer, using the
production InverseRenderer driver (craytracer_tpu/inverse.py).

Writes gallery/inverse_recovery.png: target | initial guess | recovered.

Usage: python examples/inverse_demo.py [--cpu] [--steps 60] [--size 32]
"""

from __future__ import annotations

import argparse
import sys

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--steps", type=int, default=60)
    ap.add_argument("--size", type=int, default=32)
    ap.add_argument("--out", default="gallery/inverse_recovery.png")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from craytracer_tpu.camera import Film, make_camera
    from craytracer_tpu.integrator.wavefront import render_sample
    from craytracer_tpu.inverse import InverseConfig, InverseRenderer
    from craytracer_tpu.scene import SceneBuilder
    from craytracer_tpu.utils.tonemap import tone_map

    def build(back_albedo, sphere_albedo):
        b = SceneBuilder()
        b.add_matte("floor", (0.73, 0.73, 0.73))
        i_back = b.add_matte("back", tuple(back_albedo))
        i_ball = b.add_matte("ball", tuple(sphere_albedo))
        b.add_emissive("light", (1.0, 0.95, 0.85), 18.0)
        b.add_rect((-3, 0, -3), (6, 0, 0), (0, 0, 6), "floor")
        b.add_rect((-3, 0, -2), (6, 0, 0), (0, 3.5, 0), "back")
        b.add_sphere((0.0, 0.8, 0.3), 0.7, "ball")
        b.add_rect((-1, 3.2, -1), (2, 0, 0), (0, 0, 2), "light")
        return b.build(), i_back, i_ball

    target_albedo = np.array([0.15, 0.45, 0.72], np.float32)
    target_ball = np.array([0.7, 0.25, 0.1], np.float32)
    scene_t, I_BACK, I_BALL = build(target_albedo, target_ball)
    scene_0, _, _ = build((0.5, 0.5, 0.5), (0.5, 0.5, 0.5))

    cam = make_camera((0, 1.4, 4.5), (0, 0.9, 0))
    film = Film(fov=jnp.float32(np.radians(42.0)),
                width=args.size, height=args.size)
    ids = jnp.arange(film.num_pixels, dtype=jnp.int32)

    def render(scene, spp, n_avg=4):
        acc = 0
        for s in range(n_avg):
            acc = acc + render_sample(scene, cam, film, ids, 7, spp + s, 3,
                                      estimator="physical")
        return acc / n_avg

    target = render(scene_t, 0)

    # params: (back-wall albedo row, sphere albedo row) — ids from the
    # builder (row 0 is the __default__ material)
    params0 = (scene_0.materials.color[I_BACK],
               scene_0.materials.color[I_BALL])

    def apply_fn(scene, p):
        back, ball = p
        col = scene.materials.color.at[I_BACK].set(back).at[I_BALL].set(ball)
        return scene.replace(materials=scene.materials.replace(color=col))

    def clip_fn(p):
        return tuple(jnp.clip(x, 0.02, 1.0) for x in p)

    inv = InverseRenderer(scene_0, cam, film, target, params0, apply_fn,
                          InverseConfig(learning_rate=0.04, max_depth=3),
                          seed=7, clip_fn=clip_fn)
    inv.run(args.steps, log_every=10)
    back, ball = (np.asarray(x) for x in inv.params)
    print(f"recovered back wall {back.round(3).tolist()} "
          f"(target {target_albedo.tolist()})")
    print(f"recovered sphere    {ball.round(3).tolist()} "
          f"(target {target_ball.tolist()})")

    def frame(scene):
        img = np.asarray(tone_map(np.asarray(render(scene, 100))))
        return (np.clip(img, 0, 1) * 255).astype(np.uint8).reshape(
            args.size, args.size, 3)

    from PIL import Image

    panel = np.concatenate(
        [frame(scene_t), frame(scene_0), frame(apply_fn(scene_0, inv.params))],
        axis=1)
    import os

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    Image.fromarray(panel).resize((args.size * 12, args.size * 4),
                                  Image.NEAREST).save(args.out)
    print(f"wrote {args.out} (target | init | recovered)")


if __name__ == "__main__":
    main()
