"""DeepSDF implicit geometry as a JAX MLP.

Reference: ``deepsdf.py:5-41`` — a 9-layer weight-norm MLP 3 -> 1024 (x8) -> 1
with ReLU (dropout rate 0.0), loaded from per-shape ``model_{idx}.pth``
checkpoints and evaluated over all particles to initialize the design variable
``x`` (sim.py:55-60,100-104, outer-shell values clipped to >= 1).

Weight norm is *folded at load time*: torch's parametrized ``weight_norm``
stores (g = weight_g, v = weight_v) with W = g * v / ||v||; inference only
needs the effective W, so the converter materializes it — the TPU forward pass
is 9 dense matmuls, jit/batched, bf16-friendly.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import numpy as np
import jax
import jax.numpy as jnp

NETWORK_SIZE = 1024  # deepsdf.py:7
N_LAYERS = 9


class DeepSDFParams(NamedTuple):
    weights: tuple   # 9 x (in, out)
    biases: tuple    # 9 x (out,)


def init_params(key, sizes: Sequence[int] | None = None, dtype=jnp.float32) -> DeepSDFParams:
    """Random init with the reference architecture (3 -> 1024 x 8 -> 1)."""
    if sizes is None:
        sizes = [3] + [NETWORK_SIZE] * (N_LAYERS - 1) + [1]
    ws, bs = [], []
    for i in range(len(sizes) - 1):
        key, k1 = jax.random.split(key)
        fan_in = sizes[i]
        w = jax.random.normal(k1, (sizes[i], sizes[i + 1]), dtype) / np.sqrt(fan_in)
        ws.append(w)
        bs.append(jnp.zeros((sizes[i + 1],), dtype))
    return DeepSDFParams(tuple(ws), tuple(bs))


def forward(params: DeepSDFParams, coords) -> jnp.ndarray:
    """SDF values for coords (..., 3) -> (..., 1).  ReLU between layers,
    linear head (deepsdf.py:12-38)."""
    h = coords
    n = len(params.weights)
    for i, (w, b) in enumerate(zip(params.weights, params.biases)):
        h = h @ w + b
        if i < n - 1:
            h = jax.nn.relu(h)
    return h


@jax.jit
def sdf(params: DeepSDFParams, coords) -> jnp.ndarray:
    return forward(params, coords)


def fold_weight_norm(g: np.ndarray, v: np.ndarray) -> np.ndarray:
    """Effective weight of torch weight_norm: W = g * v / ||v||_row.

    torch Linear weights are (out, in); norm is per output row (dim=0 default
    on the parametrization: ||v|| over all dims except dim 0).
    """
    norm = np.linalg.norm(v.reshape(v.shape[0], -1), axis=1, keepdims=True)
    return (g.reshape(-1, 1) * v.reshape(v.shape[0], -1) / norm).reshape(v.shape)


def convert_torch_state_dict(state_dict, dtype=jnp.float32) -> DeepSDFParams:
    """torch ``DeepSDFWithCode().state_dict()`` -> DeepSDFParams.

    Handles both parametrized weight-norm layout
    (``network.{i}.parametrizations.weight.original0/1``) and the legacy
    ``weight_g``/``weight_v`` naming; plain ``weight`` passes through.
    Weights are transposed to (in, out) for right-multiplication.
    """
    def to_np(t):
        try:
            return t.detach().cpu().numpy()
        except AttributeError:
            return np.asarray(t)

    layers = {}
    for key, val in state_dict.items():
        if not key.startswith("network."):
            continue
        parts = key.split(".")
        idx = int(parts[1])
        layers.setdefault(idx, {})[".".join(parts[2:])] = to_np(val)

    ws, bs = [], []
    for idx in sorted(layers):
        entry = layers[idx]
        if not any("weight" in k for k in entry):
            continue  # ReLU/Dropout have no params
        if "parametrizations.weight.original0" in entry:
            g = entry["parametrizations.weight.original0"]
            v = entry["parametrizations.weight.original1"]
            w = fold_weight_norm(g, v)
        elif "weight_g" in entry:
            w = fold_weight_norm(entry["weight_g"], entry["weight_v"])
        else:
            w = entry["weight"]
        ws.append(jnp.asarray(w.T, dtype))          # (in, out)
        bs.append(jnp.asarray(entry["bias"], dtype))
    return DeepSDFParams(tuple(ws), tuple(bs))


def load_pth(path, dtype=jnp.float32) -> DeepSDFParams:
    """Load a reference ``model_{min_loss_index}.pth`` checkpoint (sim.py:60)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return convert_torch_state_dict(sd, dtype)


def init_x_from_sdf(params: DeepSDFParams, points, out_num: int, set_target: bool,
                    n_points: int | None = None, dtype=jnp.float32):
    """Reference semantics of the design-variable initialization (sim.py:98-104):
    x = -1 everywhere; in --set_target mode x = sdf(points) with the outer
    shell clipped to >= 1.

    NOTE: the reference evaluates the SDF on the *unrotated, unoffset* points
    (points_torch is taken before the R/offset transform, sim.py:50-52) —
    callers must pass those coordinates.
    """
    n = len(points) if n_points is None else n_points
    if not set_target:
        return jnp.full((n,), -1.0, dtype)
    vals = sdf(params, jnp.asarray(points, dtype)).squeeze(-1)
    vals = vals.at[:out_num].set(jnp.clip(vals[:out_num], 1.0, None))
    return vals
