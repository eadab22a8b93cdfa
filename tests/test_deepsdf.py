"""DeepSDF JAX model vs the torch reference architecture (deepsdf.py:5-41):
the converter must reproduce torch weight-norm inference exactly (CPU torch is
available in the test image, so this is a true cross-framework oracle)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

from softbody_tpu.models import deepsdf


def make_torch_model(network_size=64, seed=0):
    """Reference architecture at reduced width (width is a constant, not
    structure — deepsdf.py:7)."""
    import torch.nn as nn
    from torch.nn.utils.parametrizations import weight_norm

    torch.manual_seed(seed)
    layers = []
    sizes = [3] + [network_size] * 8 + [1]
    for i in range(9):
        layers.append(weight_norm(nn.Linear(sizes[i], sizes[i + 1])))
        if i < 8:
            layers.append(nn.ReLU())
            layers.append(nn.Dropout(0.0))

    class Model(nn.Module):
        def __init__(self):
            super().__init__()
            self.network = nn.Sequential(*layers)

        def forward(self, coords):
            return self.network(coords)

    return Model()


def test_converter_matches_torch():
    model = make_torch_model()
    model.eval()
    params = deepsdf.convert_torch_state_dict(model.state_dict())
    assert len(params.weights) == 9
    pts = np.random.default_rng(1).normal(size=(257, 3)).astype(np.float32)
    with torch.no_grad():
        ref = model(torch.from_numpy(pts)).numpy()
    out = np.asarray(deepsdf.sdf(params, jnp.asarray(pts)))
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_full_width_shapes():
    params = deepsdf.init_params(jax.random.key(0))
    assert params.weights[0].shape == (3, 1024)
    assert params.weights[-1].shape == (1024, 1)
    out = deepsdf.forward(params, jnp.zeros((5, 3)))
    assert out.shape == (5, 1)


def test_init_x_semantics():
    # sim.py:98-104: x = -1 unless set_target; outer shell clipped to >= 1
    params = deepsdf.init_params(jax.random.key(2), sizes=[3, 16, 16, 1])
    pts = np.random.default_rng(3).normal(size=(50, 3))
    x0 = deepsdf.init_x_from_sdf(params, pts, out_num=20, set_target=False)
    np.testing.assert_array_equal(np.asarray(x0), -1.0)
    x1 = np.asarray(deepsdf.init_x_from_sdf(params, pts, out_num=20, set_target=True))
    assert (x1[:20] >= 1.0).all()
    vals = np.asarray(deepsdf.sdf(params, jnp.asarray(pts, jnp.float32))).squeeze(-1)
    np.testing.assert_allclose(x1[20:], vals[20:], rtol=1e-6)


def test_pth_roundtrip(tmp_path):
    model = make_torch_model(network_size=32, seed=4)
    path = tmp_path / "model_10000.pth"
    torch.save(model.state_dict(), path)
    params = deepsdf.load_pth(path)
    pts = np.random.default_rng(5).normal(size=(33, 3)).astype(np.float32)
    with torch.no_grad():
        ref = model(torch.from_numpy(pts)).numpy()
    np.testing.assert_allclose(np.asarray(deepsdf.sdf(params, jnp.asarray(pts))), ref, atol=2e-5)
