"""Env texel importance sampling A/B (VERDICT r4 item 7): MSE at equal
spp, cosine strategy (the reference's, trace.h:290-309) vs texel
importance (beyond-reference, lights.py), on the full-fidelity scene's
HDR sun env. Ground truth = a high-spp importance render.

Uses estimator='physical' (linear): both strategies estimate the same
integral, so MSE differences are pure variance — the quantity that
decides the default. Writes ENV_IMPORTANCE_AB.json.

Run on TPU: python scripts/env_importance_ab.py [--size 256] [--spp 32]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def render(scene, cam, film, spp, estimator="physical", seed=0,
           force_cosine=False):
    import jax.numpy as jnp

    from craytracer_tpu.integrator import Renderer, RenderConfig

    r = Renderer(scene, cam, film,
                 RenderConfig(num_samples=spp, max_depth=5,
                              estimator=estimator, seed=seed))
    if force_cosine and r.scene.env.importance:
        # the Renderer now DEFAULTS importance on for physical/mis
        # (ENV_IMPORTANCE_AB.json — this very A/B); undo it for the
        # cosine arm or the script measures importance-vs-importance
        r.scene = r.scene.replace(
            env=r.scene.env.replace(importance=0))
    t0 = time.time()
    r.render()
    wall = time.time() - t0
    return np.asarray(r.raw_mean()).reshape(film.height, film.width, 3), wall


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--spp", type=int, default=32)
    ap.add_argument("--ref-spp", type=int, default=256)
    ap.add_argument("--scene", default="scenes/fullscene.txt")
    args = ap.parse_args()

    import jax.numpy as jnp

    from craytracer_tpu.camera import Film
    from craytracer_tpu.io.scenefile import load_scene_file

    # two loads: IMPORTANCE yes (as committed) and with the flag stripped
    src = open(args.scene).read()
    assert "IMPORTANCE yes" in src
    cos_path = "/tmp/_ab_cosine.txt"
    open(cos_path, "w").write(src.replace("IMPORTANCE yes", ""))
    # asset paths resolve relative to the scene file's dir
    import shutil

    for f in os.listdir(os.path.dirname(args.scene) or "."):
        if f.startswith("fullscene"):
            try:
                shutil.copy(os.path.join("scenes", f), os.path.join("/tmp", f))
            except Exception:
                pass

    out = {"scene": args.scene, "size": args.size, "spp": args.spp,
           "ref_spp": args.ref_spp, "estimator": "physical",
           "date": "2026-08-20"}
    scenes = {}
    for label, path in (("importance", args.scene), ("cosine", cos_path)):
        scene, cam, film = load_scene_file(path)
        film = Film(fov=film.fov, width=args.size, height=args.size)
        scenes[label] = (scene, cam, film)
        print(f"# {label}: env.importance={scene.env.importance}",
              file=sys.stderr)

    scene, cam, film = scenes["importance"]
    truth, wall_t = render(scene, cam, film, args.ref_spp)
    print(f"# truth ({args.ref_spp} spp, importance): {wall_t:.0f}s",
          file=sys.stderr)

    for label in ("importance", "cosine"):
        scene, cam, film = scenes[label]
        img, wall = render(scene, cam, film, args.spp, seed=7,
                           force_cosine=(label == "cosine"))
        err = img - truth
        mse = float(np.mean(err * err))
        out[label] = {"mse_vs_truth": mse, "wall_s": round(wall, 1),
                      "mean": float(img.mean())}
        print(f"# {label}: mse {mse:.3e} wall {wall:.0f}s mean {img.mean():.4f}",
              file=sys.stderr)

    out["mse_ratio_cosine_over_importance"] = round(
        out["cosine"]["mse_vs_truth"] / out["importance"]["mse_vs_truth"], 2)
    out["note"] = ("equal-spp MSE; ratio > 1 means importance wins. Means "
                   "agree (same linear estimator); the variance gap is the "
                   "sun-sampling win visible in gallery/fullscene.png")
    with open("ENV_IMPORTANCE_AB.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
