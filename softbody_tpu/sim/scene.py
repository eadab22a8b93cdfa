"""Scene assembly: geometry + config -> device-resident Scene pytree.

Replaces the reference's import-time module-global setup (sim.py:41-127):
asset load, material setters (set_youngs_modulus / set_poisson_ratio / set_mass,
sim.py:288-308), density/volume computation, and the one-time hash-grid build —
all folded into one host-side builder whose output is a JAX pytree.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..config import SimConfig
from ..core.types import Materials, Scene
from ..topology.neighbors import build_topology, topology_to_jax


def lame_parameters(E, nu):
    """Young's modulus / Poisson ratio -> (mu, lambda) (sim.py:288-300)."""
    mu = E / (2.0 * (1.0 + nu))
    lam = E * nu / ((1.0 + nu) * (1.0 - 2.0 * nu))
    return mu, lam


def build_scene(
    points: np.ndarray,
    cfg: SimConfig,
    out_num: int | None = None,
    mass: float | np.ndarray | None = None,
    youngs_modulus: float | np.ndarray | None = None,
    poisson_ratio: float | np.ndarray | None = None,
    dirichlet_mask: np.ndarray | None = None,
    external_force: np.ndarray | None = None,
    obstacles=None,
) -> Scene:
    """Build a Scene.  All inputs are host numpy; output leaves are jnp arrays
    of cfg.dtype.  Scalars broadcast per-particle (the reference's all-particle
    setter variants, sim.py:302-308)."""
    rest = np.asarray(points, dtype=np.float64)
    n = rest.shape[0]
    dtype = cfg.dtype

    m = np.broadcast_to(np.asarray(mass if mass is not None else cfg.mass, np.float64), (n,))
    E = np.broadcast_to(
        np.asarray(youngs_modulus if youngs_modulus is not None else cfg.youngs_modulus, np.float64), (n,)
    )
    nu = np.broadcast_to(
        np.asarray(poisson_ratio if poisson_ratio is not None else cfg.poisson_ratio, np.float64), (n,)
    )
    mu, lam = lame_parameters(E, nu)

    topo_np, _rho, volume = build_topology(rest, m, cfg)
    topo = topology_to_jax(topo_np, dtype)

    free = (
        np.ones((n, 3)) if dirichlet_mask is None else np.asarray(dirichlet_mask, np.float64)
    )
    ext = (
        np.tile(np.asarray(cfg.external_force, np.float64), (n, 1))
        if external_force is None
        else np.asarray(external_force, np.float64)
    )

    mats = Materials(
        mass=jnp.asarray(m, dtype),
        volume=jnp.asarray(volume, dtype),
        mu=jnp.asarray(mu, dtype),
        lam=jnp.asarray(lam, dtype),
        free=jnp.asarray(free, dtype),
        external=jnp.asarray(ext, dtype),
    )
    return Scene(
        rest_position=jnp.asarray(rest, dtype),
        materials=mats,
        topology=topo,
        out_num=int(out_num if out_num is not None else n),
        obstacles=obstacles,
    )


def update_materials(
    scene: Scene,
    cfg: SimConfig,
    youngs_modulus=None,
    poisson_ratio=None,
    mass=None,
    dirichlet=None,
    external_force=None,
    index=None,
) -> Scene:
    """Setter-style material updates (set_youngs_modulus / set_poisson_ratio /
    set_mass / set_dirichlet / set_external_force, sim.py:279-308).

    Scalars apply to all particles (or to ``index`` when given — the
    reference's per-index variants, sim_taichi.py:241-288).  Changing mass
    retriggers the density/volume computation (sim.py:308) by rebuilding the
    topology tables.  Returns a new Scene (pytrees are immutable).
    """
    import numpy as np

    m = scene.materials
    n = scene.rest_position.shape[0]
    dtype = cfg.dtype

    def place(current, value):
        arr = np.asarray(current, np.float64).copy()
        if index is None:
            arr[:] = value
        else:
            arr[np.asarray(index)] = value
        return arr

    # recover current (E, nu) from (mu, lam) so either can be updated alone —
    # the reference setters recompute both Lame parameters (sim.py:288-300)
    mu_cur = np.asarray(m.mu, np.float64)
    lam_cur = np.asarray(m.lam, np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        nu_cur = lam_cur / (2.0 * (lam_cur + mu_cur))
        nu_cur = np.nan_to_num(nu_cur, nan=cfg.poisson_ratio)
        E_cur = 2.0 * mu_cur * (1.0 + nu_cur)
    E = place(E_cur, youngs_modulus) if youngs_modulus is not None else E_cur
    nu = place(nu_cur, poisson_ratio) if poisson_ratio is not None else nu_cur
    mu_new, lam_new = lame_parameters(E, nu)

    mats = m._replace(
        mu=jnp.asarray(mu_new, dtype),
        lam=jnp.asarray(lam_new, dtype),
    )
    if dirichlet is not None:
        free = np.asarray(m.free, np.float64).copy()
        if index is None:
            free[:] = np.asarray(dirichlet, np.float64)
        else:
            free[np.asarray(index)] = np.asarray(dirichlet, np.float64)
        mats = mats._replace(free=jnp.asarray(free, dtype))
    if external_force is not None:
        ext = np.asarray(m.external, np.float64).copy()
        if index is None:
            ext[:] = np.asarray(external_force, np.float64)
        else:
            ext[np.asarray(index)] = np.asarray(external_force, np.float64)
        mats = mats._replace(external=jnp.asarray(ext, dtype))
    scene = scene._replace(materials=mats)
    if mass is not None:
        if scene.topology is None:
            raise NotImplementedError(
                "mass updates on blocked scenes: rebuild with build_blocked_scene"
            )
        # mass change retriggers rho/volume (sim.py:308) and the volume-
        # dependent topology tables
        mass_arr = place(np.asarray(m.mass, np.float64), mass)
        from ..topology.neighbors import build_topology, topology_to_jax

        rest = np.asarray(scene.rest_position, np.float64)
        topo_np, _rho, volume = build_topology(rest, mass_arr, cfg)
        scene = scene._replace(
            materials=scene.materials._replace(
                mass=jnp.asarray(mass_arr, dtype),
                volume=jnp.asarray(volume, dtype),
            ),
            topology=topology_to_jax(topo_np, dtype),
        )
    return scene
