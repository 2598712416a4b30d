"""HTTP live view (integrator/live.py): the continuously-updating window
(VERDICT r4 missing #3; reference gl/glcode.h:108-151) re-designed for
headless hosts. Drives a real render with serve_port and fetches the
page, the frame, and the status over actual HTTP."""

import json
import urllib.request

import numpy as np
import jax.numpy as jnp

from craytracer_tpu.camera import Film, make_camera
from craytracer_tpu.integrator import Renderer, RenderConfig
from craytracer_tpu.scene import SceneBuilder


def test_live_view_serves_running_render():
    b = SceneBuilder()
    b.add_matte("w", (0.7, 0.7, 0.7))
    b.add_emissive("l", (1, 1, 1), 15.0)
    b.add_rect((-4, 0, -4), (8, 0, 0), (0, 0, 8), "w")
    b.add_rect((-1, 3, -1), (2, 0, 0), (0, 0, 2), "l")
    scene = b.build()
    cam = make_camera((0, 2, 5), (0, 0.5, 0))
    film = Film(fov=jnp.float32(0.8), width=24, height=24)
    # serve_port=-1: the OS picks a free port (resolved on LiveView.start)
    r = Renderer(scene, cam, film,
                 RenderConfig(num_samples=4, max_depth=2, serve_port=-1))
    r.render()
    assert r.live is not None
    port = r.live.port
    try:
        page = urllib.request.urlopen(
            f"http://127.0.0.1:{port}/", timeout=5).read()
        assert b"craytracer_tpu live" in page
        frame = urllib.request.urlopen(
            f"http://127.0.0.1:{port}/frame.png", timeout=5).read()
        assert frame[:8] == b"\x89PNG\r\n\x1a\n"  # real PNG bytes
        status = json.loads(urllib.request.urlopen(
            f"http://127.0.0.1:{port}/status", timeout=5).read())
        assert status["spp"] == 4 and status["total"] == 4
        # the served frame decodes to the rendered image
        import io

        from PIL import Image

        img = np.asarray(Image.open(io.BytesIO(frame)))
        assert img.shape == (24, 24, 3)
        want = (np.clip(np.asarray(r.image()), 0, 1) * 255).astype(np.uint8)
        np.testing.assert_array_equal(img, want)
    finally:
        r.live.stop()
