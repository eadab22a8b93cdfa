"""Shared scenario construction for the round-4 probe tools and examples.

The flagship inverse-design scenario ("drop") reproduces the reference's
workload structure (sim.py: 3000 steps at dt=5e-5 -> 0.15 s episode, body
dropped onto the ground plane with v0=-0.4 and a constant external force,
inflation field modulating stiffness through the (200 - 199*ratio) scale)
with material constants tuned for STABILITY of the explicit integrator at
the procedural body's discretization (suggest_h(32) at radius 0.05):

  c_p = sqrt(2.14 * E * scale_max / rho) with rho ~ 4.1e3  ->  omega*dt =
  c_p*pi/dx * dt <= ~0.3 requires E*scale_max <~ 1e5, hence E=250 (the
  reference's 1.5e5 assumes its own coarser h=0.007 sampling); the ground
  penalty spring omega_c = sqrt(k/m)*dt <= ~0.25 requires k <= 2.5e3, hence
  k=2e3 (reference 3e5 at dt=5e-5 sits at omega_c*dt=2.7 — past the
  stability bound; its contact survives only as bounded rattle).
"""

from __future__ import annotations

import numpy as np


def add_physics_args(ap):
    ap.add_argument("--dt", type=float, default=None)
    ap.add_argument("--integrator", default=None,
                    choices=[None, "trapezoidal", "symplectic"])
    ap.add_argument("--damping", type=float, default=None)
    ap.add_argument("--mass", type=float, default=None)
    ap.add_argument("--youngs", type=float, default=None)
    ap.add_argument("--scale-a", type=float, default=None)
    ap.add_argument("--scale-b", type=float, default=None)
    ap.add_argument("--collision-stiffness", type=float, default=None)
    ap.add_argument("--pair-def-grad", default=None, choices=[None, "i", "j"])
    ap.add_argument("--scenario", default=None, choices=[None, "drop"],
                    help="named base scenario (overrides applied on top)")


DROP = dict(dt=5e-5, youngs_modulus=250.0, collision_stiffness=2e3)


def apply_physics_args(cfg, args):
    if getattr(args, "scenario", None) == "drop":
        cfg = cfg.replace(**DROP)
    over = {}
    for arg, field in [("dt", "dt"), ("integrator", "integrator"),
                       ("damping", "damping"), ("mass", "mass"),
                       ("youngs", "youngs_modulus"),
                       ("scale_a", "scale_a"), ("scale_b", "scale_b"),
                       ("collision_stiffness", "collision_stiffness"),
                       ("pair_def_grad", "pair_def_grad")]:
        v = getattr(args, arg, None)
        if v is not None:
            over[field] = v
    return cfg.replace(**over) if over else cfg


def fit_body(n_particles: int, radius: float = 0.05):
    """Procedural inflatable body sized to ~n_particles (bench.py fit)."""
    from softbody_tpu.geometry.shapes import inflatable_sphere

    probe, _ = inflatable_sphere(n_outer=1000, radius=radius)
    a = (len(probe) - 1000) / 1000**1.5
    n_outer = 1000
    for _ in range(40):
        n_outer = max((max(n_particles - n_outer, 8.0) / a) ** (2 / 3), 8.0)
    return inflatable_sphere(n_outer=max(int(n_outer), 8), radius=radius)


def x_star_bands(pts: np.ndarray, n_slots: int, sop) -> np.ndarray:
    """Ground-truth inflation field: 1.5 radial bands in [-1, 1]."""
    r = np.linalg.norm(pts - pts.mean(0), axis=1)
    xp = np.sin(r / r.max() * 3.0 * np.pi)
    x = np.zeros(n_slots)
    x[sop] = xp
    return x
