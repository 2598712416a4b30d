"""EXR writer cross-validation against the ACTUAL reference binary.

write_exr output is fed to the reference renderer (refbuild/craytracer_ref,
linked against real OpenEXR) as a textured ENV_LIGHT — its readRgba1
(imagefile.h / buildscene.h:451-497) must accept the file and the rendered
env radiance must match the written color. This is the only external EXR
validator in the environment (no OpenEXR python bindings)."""

import os
import subprocess

import numpy as np
import pytest

HERE = os.path.dirname(__file__)
REPO = os.path.dirname(HERE)
REF_BIN = os.path.join(REPO, "refbuild", "craytracer_ref")

SCENE = """WINDOW_WIDTH 32
WINDOW_HEIGHT 32
IMAGE_WIDTH 32
IMAGE_HEIGHT 32
FOV 38.0
CAMERA_POS 0 0 5
LOOK_POINT 0 0 0

MATERIAL MATTE
NAME grey
COLOR 0.5 0.5 0.5
SIGMA 0.0
END

END_MATERIALS

ENV_LIGHT
TYPE TEXTURE
COLOR {exr}
INTENSITY 1.0

OBJECT SPHERE
RADIUS 0.2
CENTER 0 -500 0
PHI 3.14159
MIN_THETA 0
MAX_THETA 3.14159
MATERIAL grey
"""

CONFIG = """scene_file {scene}
num_samples 4
num_sample_sets 83
max_depth 1
trace_type PATHTRACE
accel_struct NONE
image_save no
caustic_map no
"""


@pytest.mark.skipif(not os.path.exists(REF_BIN),
                    reason="headless reference binary not built")
def test_reference_binary_reads_our_exr(tmp_path):
    from craytracer_tpu.io.exr import write_exr
    from craytracer_tpu.io.imagestate import read_reference_is

    color = np.array([0.1, 0.9, 0.2], np.float32)
    env = np.broadcast_to(color, (8, 16, 3)).copy()
    exr_path = str(tmp_path / "green.exr")
    write_exr(exr_path, env)

    (tmp_path / "env.txt").write_text(SCENE.format(exr=exr_path))
    (tmp_path / "config.txt").write_text(CONFIG.format(scene="env.txt"))

    proc = subprocess.run([REF_BIN], cwd=tmp_path, capture_output=True,
                          text=True, timeout=300)
    assert proc.returncode == 0, proc.stderr[-2000:]
    accum, spp, w, h = read_reference_is(str(tmp_path / "savestate.is"))
    assert (w, h) == (32, 32)
    mean = accum.reshape(-1, 3).mean(axis=0) / max(spp, 1)
    # every camera ray (except the off-screen sphere) misses -> env color.
    # The reference divides float texels by 255 (getTexColor,
    # texture.cpp:78 — the byte-texture convention applied to HDR data; a
    # quirk we deliberately do NOT copy, io/teximage.py). So the
    # reference's radiance is color/255; the RATIO proves readRgba1
    # accepted the file and the values survived (FLOAT->half ~0.1%).
    np.testing.assert_allclose(mean, color / 255.0, rtol=0.02, atol=1e-5)


@pytest.mark.skipif(not os.path.exists(REF_BIN),
                    reason="headless reference binary not built")
def test_env_texture_parity_with_reference(tmp_path):
    """The same uniform-EXR env scene through OUR pipeline matches the
    reference's accumulator (uniform map, so the rot-y/lat-long mapping
    conventions cancel)."""
    import jax.numpy as jnp

    from craytracer_tpu.integrator import Renderer, RenderConfig
    from craytracer_tpu.io.exr import write_exr
    from craytracer_tpu.io.scenefile import load_scene_file

    color = np.array([0.1, 0.9, 0.2], np.float32)
    env = np.broadcast_to(color, (8, 16, 3)).copy()
    exr_path = str(tmp_path / "green.exr")
    write_exr(exr_path, env)
    scene_path = tmp_path / "env.txt"
    scene_path.write_text(SCENE.format(exr=exr_path))

    scene, cam, film = load_scene_file(str(scene_path), accel="none")
    r = Renderer(scene, cam, film,
                 RenderConfig(num_samples=4, max_depth=1,
                              estimator="physical"))
    r.render()
    mean = r.raw_mean().reshape(-1, 3).mean(axis=0)
    np.testing.assert_allclose(mean, color, rtol=0.02, atol=0.01)
