"""softbody_tpu — a TPU-native differentiable meshless inflatable soft-body engine.

From-scratch JAX/XLA/Pallas re-design of the capabilities of
Megumi-X/meshless-inflatable-softbody (see SURVEY.md): corotated meshless StVK
elasticity over point-cloud bodies, a per-particle inflation stiffness field
optimized end-to-end against target trajectories, DeepSDF implicit geometry,
and an offline PBRT-v4 + ffmpeg render pipeline.
"""

from .config import SimConfig, taichi_parity, warp_parity
from .core.types import Materials, ParticleState, Scene, Topology
from .sim.scene import build_scene
from .sim.rollout import rollout, loss_fn, value_and_grad_fn, step, initial_state

__version__ = "0.1.0"

__all__ = [
    "SimConfig",
    "warp_parity",
    "taichi_parity",
    "Materials",
    "ParticleState",
    "Scene",
    "Topology",
    "build_scene",
    "rollout",
    "loss_fn",
    "value_and_grad_fn",
    "step",
    "initial_state",
]
