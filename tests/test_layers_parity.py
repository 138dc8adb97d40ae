"""Layer-level parity: our NHWC conv / transposed-conv / LSTM vs torch CPU
with ported weights. These pin the exact geometry (padding, output_padding,
gate order) needed for torch→JAX checkpoint porting."""
import numpy as np
import torch
import torch.nn as nn

import jax
import jax.numpy as jnp

from svtpu.ops.conv import Conv2dTorch, ConvTranspose2dTorch
from svtpu.ops.lstm import LSTM


def test_conv2d_parity():
    torch.manual_seed(0)
    m = nn.Conv2d(3, 8, kernel_size=3, stride=2, padding=1)
    x = torch.randn(2, 3, 16, 16)
    with torch.no_grad():
        expected = m(x).numpy()

    mod = Conv2dTorch(8, 3, 2, 1)
    params = {
        "kernel": jnp.asarray(
            m.weight.detach().numpy().transpose(2, 3, 1, 0)),  # OIHW→HWIO
        "bias": jnp.asarray(m.bias.detach().numpy()),
    }
    got = mod.apply({"params": params},
                    jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    got = np.asarray(got).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-4)


def test_conv2d_k4_parity():
    torch.manual_seed(1)
    m = nn.Conv2d(3, 8, kernel_size=4, stride=2, padding=1)
    x = torch.randn(2, 3, 16, 16)
    with torch.no_grad():
        expected = m(x).numpy()
    mod = Conv2dTorch(8, 4, 2, 1)
    params = {
        "kernel": jnp.asarray(m.weight.detach().numpy().transpose(2, 3, 1, 0)),
        "bias": jnp.asarray(m.bias.detach().numpy()),
    }
    got = mod.apply({"params": params},
                    jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2),
                               expected, rtol=1e-4, atol=1e-4)


def _convt_params(m):
    # torch ConvTranspose2d weight [I, O, kh, kw] → equivalent-conv HWIO:
    # spatial flip, then [kh, kw, I, O].
    w = m.weight.detach().numpy()[:, :, ::-1, ::-1]
    return {
        "kernel": jnp.asarray(np.ascontiguousarray(w.transpose(2, 3, 0, 1))),
        "bias": jnp.asarray(m.bias.detach().numpy()),
    }


def test_conv_transpose_k3_parity():
    torch.manual_seed(2)
    m = nn.ConvTranspose2d(8, 4, 3, 2, 1, output_padding=1)
    x = torch.randn(2, 8, 8, 8)
    with torch.no_grad():
        expected = m(x).numpy()
    mod = ConvTranspose2dTorch(4, 3, 2, 1, 1)
    got = mod.apply({"params": _convt_params(m)},
                    jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    got = np.asarray(got).transpose(0, 3, 1, 2)
    assert got.shape == expected.shape == (2, 4, 16, 16)
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-4)


def test_conv_transpose_k4_parity():
    torch.manual_seed(3)
    m = nn.ConvTranspose2d(8, 4, 4, 2, 1)
    x = torch.randn(2, 8, 8, 8)
    with torch.no_grad():
        expected = m(x).numpy()
    mod = ConvTranspose2dTorch(4, 4, 2, 1, 0)
    got = mod.apply({"params": _convt_params(m)},
                    jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    got = np.asarray(got).transpose(0, 3, 1, 2)
    assert got.shape == expected.shape == (2, 4, 16, 16)
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-4)


def test_lstm_parity_multilayer():
    torch.manual_seed(4)
    B, T, D, H, L = 3, 7, 5, 6, 2
    m = nn.LSTM(D, H, num_layers=L, batch_first=True)
    x = torch.randn(B, T, D)
    with torch.no_grad():
        expected, _ = m(x)

    params = {}
    for layer in range(L):
        w_ih = getattr(m, f"weight_ih_l{layer}").detach().numpy()  # [4H, Din]
        w_hh = getattr(m, f"weight_hh_l{layer}").detach().numpy()
        b = (getattr(m, f"bias_ih_l{layer}")
             + getattr(m, f"bias_hh_l{layer}")).detach().numpy()
        params[f"w_ih_{layer}"] = jnp.asarray(w_ih.T)
        params[f"w_hh_{layer}"] = jnp.asarray(w_hh.T)
        params[f"b_{layer}"] = jnp.asarray(b)

    mod = LSTM(hidden_size=H, num_layers=L)
    got = mod.apply({"params": params}, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(got), expected.numpy(),
                               rtol=1e-4, atol=1e-4)


def test_lstm_residual_identity_path():
    """svtpu extension: ``residual=True`` adds the layer input wherever the
    width is preserved, with an unchanged parameter structure (checkpoints
    port 1:1 between the two modes)."""
    rng = np.random.default_rng(7)
    B, T, H = 2, 5, 6
    x = jnp.asarray(rng.normal(size=(B, T, H)).astype(np.float32))

    plain = LSTM(hidden_size=H, num_layers=1)
    res = LSTM(hidden_size=H, num_layers=1, residual=True)
    variables = plain.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(
        res.init(jax.random.PRNGKey(0), x)) == \
        jax.tree_util.tree_structure(variables)

    out_plain = plain.apply(variables, x)
    out_res = res.apply(variables, x)
    np.testing.assert_allclose(np.asarray(out_res),
                               np.asarray(out_plain + x),
                               rtol=1e-5, atol=1e-6)

    # Width-changing first layer (D != H) must NOT get the identity path.
    D = H + 2
    x2 = jnp.asarray(rng.normal(size=(B, T, D)).astype(np.float32))
    plain2 = LSTM(hidden_size=H, num_layers=1)
    res2 = LSTM(hidden_size=H, num_layers=1, residual=True)
    v2 = plain2.init(jax.random.PRNGKey(1), x2)
    np.testing.assert_allclose(np.asarray(res2.apply(v2, x2)),
                               np.asarray(plain2.apply(v2, x2)),
                               rtol=1e-6, atol=1e-7)
