"""Scene-file / config / OBJ parsing tests, loading the reference's shipped
fixture scenes verbatim from /root/reference."""

import os
import textwrap

import numpy as np
import pytest

from craytracer_tpu.io.config import parse_config
from craytracer_tpu.io.scenefile import load_scene_file
from craytracer_tpu.io.tokenizer import atof
from craytracer_tpu.scene import types as T

REF = "/root/reference"


def test_atof_malformed():
    assert atof("548.8.0") == 548.8
    assert atof("-114.") == -114.0
    assert atof("yes") == 0.0


@pytest.mark.skipif(not os.path.exists(f"{REF}/config.txt"), reason="no reference")
def test_parse_reference_config():
    cfg = parse_config(f"{REF}/config.txt")
    assert cfg.num_samples == 1
    assert cfg.max_depth == 1
    assert cfg.trace_type == "PATHTRACE"
    assert cfg.accel_struct == "GRID"


@pytest.mark.skipif(not os.path.exists(f"{REF}/cornell_box.txt"), reason="no reference")
def test_load_cornell_box():
    scene, camera, film = load_scene_file(f"{REF}/cornell_box.txt")
    # 9 rects (2 lights + 5 walls + floor/ceiling duplicates), 20 triangles (2 boxes)
    assert scene.rects.mat_id.shape[0] == 9
    assert scene.triangles.mat_id.shape[0] == 20
    # two rect area lights derived from the emissive material
    area_rects = int(np.sum(np.asarray(scene.lights.light_type) == T.LIGHT_AREA_RECT))
    assert area_rects == 2
    # env light present with 0 intensity -> not a selectable light
    env_lights = int(np.sum(np.asarray(scene.lights.light_type) == T.LIGHT_ENV))
    assert env_lights == 0
    # power normalized
    np.testing.assert_allclose(np.asarray(scene.lights.power).sum(), 1.0, rtol=1e-5)
    # camera at the cornell viewpoint
    np.testing.assert_allclose(np.asarray(camera.position), [278.0, 273.0, 800.0])
    # materials parsed with the legacy DIFF_COLOR grammar
    mats = scene.materials
    emissive_rows = np.asarray(mats.mat_type) == T.MAT_EMISSIVE
    assert emissive_rows.sum() == 1
    idx = int(np.argmax(emissive_rows))
    np.testing.assert_allclose(np.asarray(mats.color)[idx], [1.0, 0.85, 0.5], atol=1e-6)
    np.testing.assert_allclose(np.asarray(mats.intensity)[idx], 90.0)


@pytest.mark.skipif(not os.path.exists(f"{REF}/example_scene.txt"), reason="no reference")
def test_load_example_scene():
    scene, camera, film = load_scene_file(f"{REF}/example_scene.txt")
    assert scene.spheres.mat_id.shape[0] == 1
    assert scene.planes.mat_id.shape[0] == 1
    assert scene.rects.mat_id.shape[0] == 1
    assert scene.disks.mat_id.shape[0] == 1
    assert scene.triangles.mat_id.shape[0] == 1  # cube.obj is absent -> skipped
    assert scene.instanced.mat_id.shape[0] == 1  # torus


def test_obj_loader(tmp_path):
    obj = tmp_path / "tri.obj"
    obj.write_text(textwrap.dedent("""\
        v 0 0 0
        v 1 0 0
        v 1 1 0
        v 0 1 0
        vt 0 0
        vt 1 0
        vt 1 1
        vt 0 1
        vn 0 0 1
        f 1/1/1 2/2/1 3/3/1 4/4/1
    """))
    from craytracer_tpu.io.objloader import load_obj

    shapes, mats = load_obj(str(obj))
    assert len(shapes) == 1
    s = shapes[0]
    assert s.indices.shape == (2, 3)  # quad fan-triangulated
    assert s.positions.shape == (4, 3)
    assert s.normals.shape == (4, 3)
    assert s.texcoords.shape == (4, 2)


def test_vertex_normals():
    from craytracer_tpu.io.objloader import compute_vertex_normals

    pos = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    idx = np.array([[0, 1, 2]], np.int32)
    n = compute_vertex_normals(pos, idx)
    np.testing.assert_allclose(n, [[0, 0, 1]] * 3, atol=1e-6)
