"""Dynamic re-binned contact (ops/contact.py) vs the O(N^2) oracle.

The reference's static rest topology (hash grid built once over rest
positions, sim.py:123-127) cannot express inter-body or self contact; these
tests cover the dynamic path: exactness vs brute force, gradient flow, and a
two-body collision that static topology provably misses."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from softbody_tpu import warp_parity, build_scene
from softbody_tpu.geometry.compose import Body, compose, translated
from softbody_tpu.geometry.shapes import inflatable_sphere, suggest_h
from softbody_tpu.ops.contact import (
    build_contact_grid, contact_forces, contact_forces_allpairs, max_occupancy,
)
from softbody_tpu.sim.rollout import rollout


def _cloud(n=400, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.uniform(0.0, 1.0, (n, 3)))


def test_dynamic_matches_allpairs():
    pos = _cloud()
    grid = build_contact_grid([-0.1] * 3, [1.1] * 3, r_c=0.12, cap=32)
    assert int(max_occupancy(pos, grid)) <= 32
    f_dyn = jax.jit(lambda p: contact_forces(p, grid))(pos)
    f_ref = contact_forces_allpairs(pos, grid)
    np.testing.assert_allclose(np.asarray(f_dyn), np.asarray(f_ref),
                               rtol=1e-10, atol=1e-12)


def test_out_of_grid_particles_are_inert():
    pos = np.array(_cloud(200))
    pos[:10] += 100.0  # park some particles far outside the grid
    pos = jnp.asarray(pos)
    grid = build_contact_grid([-0.1] * 3, [1.1] * 3, r_c=0.12, cap=32)
    f = np.asarray(contact_forces(pos, grid))
    assert np.all(f[:10] == 0.0)
    f_ref = np.asarray(contact_forces_allpairs(pos, grid))
    np.testing.assert_allclose(f, f_ref, rtol=1e-10, atol=1e-12)


def test_exclude_table_skips_pairs():
    pos = _cloud(100)
    grid = build_contact_grid([-0.1] * 3, [1.1] * 3, r_c=0.3, cap=64)
    # exclude everything -> zero forces
    excl = jnp.tile(jnp.arange(100, dtype=jnp.int32)[None, :], (100, 1))
    f = np.asarray(contact_forces(pos, grid, exclude=excl))
    assert np.all(f == 0.0)


def test_overflow_detection():
    """An overfull cell must be DETECTED, not silently truncated
    (ops/contact.py cap contract)."""
    pos = _cloud(64)
    # every particle in one cell, cap far below occupancy
    grid = build_contact_grid([-0.1] * 3, [1.1] * 3, r_c=2.0, cap=4)
    assert int(max_occupancy(pos, grid)) > 4
    f, ovf = jax.jit(
        lambda p: contact_forces(p, grid, with_overflow=True))(pos)
    assert bool(ovf)
    # roomy cap on the same cloud -> no overflow, identical call shape
    grid_ok = build_contact_grid([-0.1] * 3, [1.1] * 3, r_c=0.12, cap=32)
    f2, ovf2 = contact_forces(pos, grid_ok, with_overflow=True)
    assert not bool(ovf2)
    np.testing.assert_allclose(
        np.asarray(f2), np.asarray(contact_forces(pos, grid_ok)))


def test_overflow_warns_inside_episode():
    """total_force surfaces the overflow via a RuntimeWarning (once per
    process) when cfg.contact_check is on."""
    import warnings

    from softbody_tpu.sim import rollout as ro

    pts, out_num = inflatable_sphere(n_outer=24, radius=0.02)
    h = suggest_h(pts, 12)
    cfg = warp_parity().replace(h=h, dtype="float64", dt=1e-6, frames=4,
                                target_frames=2)
    scene = build_scene(pts, cfg, out_num=out_num)
    # cell = 4h holds many particles of a body whose spacing is ~h: cap=1
    # guarantees overflow
    grid = build_contact_grid(pts.min(0) - 0.01, pts.max(0) + 0.01,
                              r_c=4.0 * h, cap=1)
    scene_c = scene._replace(contact=grid)
    x = jnp.zeros(scene.rest_position.shape[0], dtype=jnp.float64)
    ro._overflow_warned = False
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        _, final, _ = rollout(x, scene_c, cfg, n_steps=2)
        jax.block_until_ready(final.position)
        jax.effects_barrier()
    ro._overflow_warned = False
    assert any("cap=1" in str(w.message) for w in rec), (
        [str(w.message) for w in rec])


def test_contact_gradient_flows():
    pos = _cloud(64)
    grid = build_contact_grid([-0.1] * 3, [1.1] * 3, r_c=0.25, cap=64)

    def energyish(p):
        return jnp.sum(contact_forces(p, grid) ** 2)

    g = jax.jit(jax.grad(energyish))(pos)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).max()) > 0.0


@pytest.mark.slow
def test_two_body_collision_needs_dynamic_topology():
    """A body launched at a clamped body: static rest topology produces no
    interaction (they are disjoint at rest — the free run interpenetrates and
    eventually blows up), the dynamic contact grid repels the flyer.  The
    contact force at a mid-collision frame matches the O(N^2) oracle."""
    b1_pts, n1 = inflatable_sphere(n_outer=40, radius=0.02, center=(0, 0.05, 0))
    h = suggest_h(b1_pts, 14)
    # surface gap just beyond the 2h elastic support: disjoint at rest
    b1 = Body(points=b1_pts, out_num=n1, name="a")
    b2 = translated(b1, [0.04 + 2.2 * h, 0.0, 0.0])
    comp = compose([b1, b2])
    n = len(comp.points)
    cfg = warp_parity().replace(
        h=h, dtype="float64", dt=2e-6, damping=0.0, collision=False,
        initial_velocity=(-2.0, 0.0, 0.0))  # body B flies at A
    s0, s1 = comp.body_slice(0), comp.body_slice(1)
    free = np.ones((n, 3))
    free[s0] = 0.0                           # clamp body A
    scene = build_scene(comp.points, cfg, dirichlet_mask=free,
                        external_force=np.zeros((n, 3)))
    x = jnp.zeros(n, dtype=jnp.float64)

    r_c = 0.8 * cfg.h
    grid = build_contact_grid(comp.points.min(0) - 0.05,
                              comp.points.max(0) + 0.05, r_c=r_c, cap=64,
                              stiffness=2e6,
                              exclude=np.asarray(scene.topology.idx))
    # static topology: no cross-body rest neighbors exist
    idx = np.asarray(scene.topology.idx)
    assert (idx[s0] < s1.start).all()
    assert (idx[s1] >= s1.start).all()

    steps, every = 8000, 400

    def min_gaps(rec):
        P = np.asarray(rec[0])
        return np.array([
            np.linalg.norm(p[s0][:, None, :] - p[s1][None, :, :], axis=-1).min()
            for p in P])

    _, _, rec_free = rollout(x, scene, cfg, n_steps=steps, record_every=every)
    scene_c = scene._replace(contact=grid)
    _, _, rec_c = rollout(x, scene_c, cfg, n_steps=steps, record_every=every)
    g_free = min_gaps(rec_free)
    g_c = min_gaps(rec_c)

    # without contact the flyer interpenetrates well inside r_c (and the
    # unphysical overlap eventually destabilizes the elastic model); with
    # contact it is repelled and the whole trajectory stays finite
    assert g_free.min() < 0.4 * r_c, g_free.min()
    assert g_c.min() > 1.8 * g_free.min(), (g_free.min(), g_c.min())
    assert np.isfinite(np.asarray(rec_c[0])).all()
    assert g_c[-1] > 2 * g_c.min()           # bounced off

    # oracle check at a mid-collision frame
    pos_mid = jnp.asarray(np.asarray(rec_c[0])[int(np.argmin(g_c))])
    f_dyn = np.asarray(contact_forces(pos_mid, grid))
    f_ref = np.asarray(contact_forces_allpairs(pos_mid, grid))
    np.testing.assert_allclose(f_dyn, f_ref, rtol=1e-9, atol=1e-11)
    assert np.abs(f_dyn).max() > 0.0
