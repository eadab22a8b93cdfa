"""Shim: the scenario definitions moved into the package (softbody_tpu.scenarios)
so examples and the CLI can use them; the probe tools import through here."""
from softbody_tpu.scenarios import (  # noqa: F401
    DROP, STRETCH, add_physics_args, apply_physics_args, dirichlet_mask,
    fit_body, x_star_bands,
)
