"""Reference-checkpoint porting: a torch twin of the contrastive RBVAE
(same Sequential layout as the reference model, so state_dict keys match
real checkpoints) → convert_rbvae → bit-level forward parity."""
import numpy as np
import torch
import torch.nn as tnn

import jax
import jax.numpy as jnp

from svtpu.config import rbvae_variant
from svtpu.models.convert_rbvae import convert_rbvae
from svtpu.models.rbvae import Seq2SeqBinaryVAE

LATENT = 10
RES = 32   # shrunken spatial size; channel/layout logic identical


class TorchTwin(tnn.Module):
    """State-dict-compatible twin of the reference contrastive model
    (conv trunk 3x[k3 s2 p1] with ReLU+Dropout, Linear, 2-layer LSTMs,
    mirrored deconv stack)."""

    def __init__(self, latent=LATENT, ch=64, enc_hw=RES // 8):
        super().__init__()
        flat = ch * enc_hw * enc_hw

        class Enc(tnn.Module):
            def __init__(self):
                super().__init__()
                self.conv = tnn.Sequential(
                    tnn.Conv2d(3, ch, 3, 2, 1), tnn.ReLU(), tnn.Dropout(0.2),
                    tnn.Conv2d(ch, ch, 3, 2, 1), tnn.ReLU(), tnn.Dropout(0.2),
                    tnn.Conv2d(ch, ch, 3, 2, 1), tnn.Flatten())
                self.fc = tnn.Linear(flat, latent)

            def forward(self, x):
                return self.fc(self.conv(x))

        class Dec(tnn.Module):
            def __init__(self):
                super().__init__()
                self.fc = tnn.Linear(latent, flat)
                self.deconv = tnn.Sequential(
                    tnn.ConvTranspose2d(ch, ch, 3, 2, 1, output_padding=1),
                    tnn.ReLU(), tnn.Dropout(0.2),
                    tnn.ConvTranspose2d(ch, ch, 3, 2, 1, output_padding=1),
                    tnn.ReLU(), tnn.Dropout(0.2),
                    tnn.ConvTranspose2d(ch, 3, 3, 2, 1, output_padding=1),
                    tnn.Sigmoid())

            def forward(self, z):
                h = self.fc(z).reshape(-1, ch, enc_hw, enc_hw)
                return self.deconv(h)

        class Rnn(tnn.Module):
            def __init__(self):
                super().__init__()
                self.lstm = tnn.LSTM(latent, latent, 2, batch_first=True)

            def forward(self, x):
                return self.lstm(x)[0]

        self.encoder_cnn = Enc()
        self.decoder_cnn = Dec()
        self.encoder_rnn = Rnn()
        self.decoder_rnn = Rnn()

    def forward_no_noise(self, x, temperature):
        """Reference forward (contrastive_RBVAE_model.py:142-169) with the
        logistic noise zeroed so parity is deterministic."""
        B, T = x.shape[:2]
        flat = x.reshape(B * T, *x.shape[2:])
        logits = self.encoder_cnn(flat).reshape(B, T, -1)
        h_seq = self.encoder_rnn(logits)
        z_seq = torch.sigmoid(h_seq / temperature)
        d_seq = self.decoder_rnn(z_seq)
        rec = self.decoder_cnn(d_seq.reshape(B * T, -1))
        return rec.reshape(x.shape), h_seq, z_seq, logits


def test_checkpoint_port_forward_parity():
    torch.manual_seed(0)
    twin = TorchTwin().eval()
    cfg = rbvae_variant("contrastive", latent_dim=LATENT, input_hw=(RES, RES))
    params = convert_rbvae(twin.state_dict(), cfg)

    x = torch.rand(2, 3, 3, RES, RES)
    with torch.no_grad():
        rec_t, h_t, z_t, logits_t = twin.forward_no_noise(x, 0.5)

    model = Seq2SeqBinaryVAE(cfg)
    xj = jnp.asarray(x.numpy().transpose(0, 1, 3, 4, 2))  # NCHW→NHWC
    out = model.apply(params, xj, 0.5, False, deterministic=True)

    np.testing.assert_allclose(np.asarray(out.logits), logits_t.numpy(),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out.h_seq), h_t.numpy(),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out.z_seq), z_t.numpy(),
                               rtol=1e-3, atol=1e-4)
    rec_j = np.asarray(out.x_recon).transpose(0, 1, 4, 2, 3)
    np.testing.assert_allclose(rec_j, rec_t.numpy(), rtol=1e-3, atol=1e-4)


def test_checkpoint_dict_unwrapping():
    torch.manual_seed(1)
    twin = TorchTwin().eval()
    cfg = rbvae_variant("contrastive", latent_dim=LATENT, input_hw=(RES, RES))
    ckpt = {"epoch": 3, "model_state_dict": twin.state_dict(),
            "consistency_score": 0.9}
    params = convert_rbvae(ckpt, cfg)
    assert "encoder_cnn" in params["params"]


def test_bitmatch_vs_torch_reference_codes():
    """Fidelity metric: ported checkpoint must produce 100% bit-identical
    hard codes vs the torch model in deterministic mode."""
    from svtpu.evaluation.bitmatch import bit_match, codes_from_torch_checkpoint

    torch.manual_seed(2)
    twin = TorchTwin().eval()
    cfg = rbvae_variant("contrastive", latent_dim=LATENT, input_hw=(RES, RES))
    x = torch.rand(12, 3, RES, RES)
    with torch.no_grad():
        # torch codes: per-frame T=1 encode, no noise, hard threshold
        _, h_t, _, _ = twin.forward_no_noise(x[:, None], 0.2)
        torch_codes = (torch.sigmoid(h_t[:, 0] / 0.2) > 0.5).float().numpy()

    frames = x.numpy().transpose(0, 2, 3, 1)
    codes = codes_from_torch_checkpoint(twin.state_dict(), cfg, frames,
                                        temperature=0.2)
    m = bit_match(codes, torch_codes)
    assert m["bit_match_pct"] == 100.0
    assert m["exact_code_match_pct"] == 100.0
