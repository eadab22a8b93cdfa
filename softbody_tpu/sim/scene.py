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
