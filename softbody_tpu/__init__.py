"""softbody_tpu — a TPU-native differentiable meshless inflatable soft-body engine.

From-scratch JAX/XLA/Pallas re-design of the capabilities of
Megumi-X/meshless-inflatable-softbody (see SURVEY.md): corotated meshless StVK
elasticity over point-cloud bodies, a per-particle inflation stiffness field
optimized end-to-end against target trajectories, DeepSDF implicit geometry,
SDF obstacle contact, multi-chip particle sharding, and an offline PBRT-v4 +
ffmpeg render pipeline.

Layer map (SURVEY.md §7):
  config          — SimConfig + warp/taichi parity presets
  geometry        — procedural bodies, PLY/OBJ IO, multi-body composition
  models.deepsdf  — implicit geometry MLP (+ torch .pth converter)
  topology        — static rest-space neighbor structures (tables, slot blocks,
                    native C++ hash grid)
  oracle          — NumPy f64 O(N^2) golden reference
  ops             — SPH kernels, batched 3x3 algebra/SVD, elasticity,
                    collision, obstacles, Pallas pair kernels
  sim             — scenes, blocked backend, lax.scan episode runner
  opt             — L-BFGS / Adam inverse-design drivers, targets, grad check
  parallel        — particle mesh sharding + halo exchange
  render          — PBRT scene writer, frame adapters, video export
  utils           — io, checkpointing, profiling
"""

from .config import SimConfig, taichi_parity, warp_parity
from .core.types import Materials, ParticleState, Scene, Topology
from .sim.scene import build_scene
from .sim.blocked import build_blocked_scene
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
    "build_blocked_scene",
    "rollout",
    "loss_fn",
    "value_and_grad_fn",
    "step",
    "initial_state",
]
