"""CLI-level eval tests: the side-by-side multi-model comparison
(reference's combined two-model chart/CSV,
``embedding_matching.py:400-565``, ``embedding_hamming_distance.py:193-288``)
driven end-to-end through ``svtpu.cli``."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from svtpu import cli
from svtpu.config import rbvae_variant
from svtpu.models.rbvae import Seq2SeqBinaryVAE
from svtpu.training.checkpoints import BestCheckpointer


@pytest.fixture(scope="module")
def video_dir(tmp_path_factory):
    """48 tiny jpgs in the %010d.jpg layout + a 3-state flag set."""
    from PIL import Image

    d = tmp_path_factory.mktemp("frames")
    rng = np.random.default_rng(0)
    for i in range(48):
        arr = np.full((32, 32, 3), 40 * (i // 16), np.uint8)
        arr = np.clip(arr + rng.integers(0, 40, arr.size)
                      .reshape(arr.shape), 0, 255).astype(np.uint8)
        Image.fromarray(arr).save(d / f"{i:010d}.jpg")
    return d


def _save_ckpt(tmp_path, name, seed, latent=6):
    cfg = rbvae_variant("contrastive", latent_dim=latent, input_hw=(32, 32))
    model = Seq2SeqBinaryVAE(cfg)
    params = model.init({"params": jax.random.key(seed)},
                        jnp.zeros((1, 1, 32, 32, 3)), 1.0, False,
                        deterministic=True)
    ck = BestCheckpointer(tmp_path / name)
    # Trainer checkpoints {"params": TrainState.params} where
    # TrainState.params is itself the {"params": ...} apply tree.
    ck.save({"params": params}, epoch=0, metric=0.0)
    return str(tmp_path / name)


VIDEO = ["--video", "tiny", "--flags", "16", "32", "--last-frame", "47",
         "--grey-out", "0", "--resolution", "32"]


def test_eval_consistency_side_by_side(video_dir, tmp_path):
    a = _save_ckpt(tmp_path, "a", 0)
    b = _save_ckpt(tmp_path, "b", 1)
    out = tmp_path / "out"
    cli.main(["eval-consistency", *VIDEO,
              "--frames-dir", str(video_dir),
              "--model", f"ckpt={a},name=pixels,latent=6",
              "--model", f"ckpt={b},name=other,latent=6",
              "--trials", "2", "--out-dir", str(out)])
    csv = (out / "consistency.csv").read_text()
    assert "pixels," in csv and "other," in csv
    # 2 models x 3 perturbations + header
    assert len(csv.strip().splitlines()) == 7
    assert (out / "consistency.png").exists()


def test_eval_hamming_side_by_side(video_dir, tmp_path):
    a = _save_ckpt(tmp_path, "a2", 2)
    b = _save_ckpt(tmp_path, "b2", 3)
    out = tmp_path / "out2"
    cli.main(["eval-hamming", *VIDEO,
              "--frames-dir", str(video_dir),
              "--model", f"ckpt={a},name=pixels,latent=6",
              "--model", f"ckpt={b},name=other,latent=6",
              "--out-dir", str(out)])
    csv = (out / "hamming.csv").read_text()
    assert "pixels," in csv and "other," in csv
    assert (out / "hamming.png").exists()


def test_eval_single_model_unchanged(video_dir, tmp_path):
    """The original --ckpt interface still works (backward compat)."""
    a = _save_ckpt(tmp_path, "a3", 4)
    out = tmp_path / "out3"
    cli.main(["eval-consistency", *VIDEO,
              "--frames-dir", str(video_dir),
              "--ckpt", a, "--latent-dim", "6",
              "--trials", "1", "--out-dir", str(out)])
    assert (out / "consistency.csv").exists()


def test_model_spec_errors(video_dir, tmp_path):
    with pytest.raises(SystemExit, match="ckpt"):
        cli.main(["eval-hamming", *VIDEO, "--frames-dir", str(video_dir),
                  "--model", "name=x", "--out-dir", str(tmp_path)])
    with pytest.raises(SystemExit, match="unknown --model keys"):
        cli.main(["eval-hamming", *VIDEO, "--frames-dir", str(video_dir),
                  "--model", "ckpt=x,bogus=1", "--out-dir", str(tmp_path)])
    with pytest.raises(SystemExit, match="--ckpt or at least one"):
        cli.main(["eval-hamming", *VIDEO, "--frames-dir", str(video_dir),
                  "--out-dir", str(tmp_path)])


def test_eval_tradeoff(video_dir, tmp_path):
    """eval-tradeoff over a fake sweep dir: two checkpoints + their
    config jsons -> joint CSV + scatter chart + pareto front."""
    import json

    sweep = tmp_path / "sweep"
    sweep.mkdir()
    for i in range(2):
        _save_ckpt(sweep, f"best_model_local_{i}", seed=10 + i)
        (sweep / f"local_{i}_config.json").write_text(json.dumps(
            {"config": {"latent_dim": 6, "noise_ratio": 0.1,
                        "margin": 1.0 + i}}))
    out = tmp_path / "out_t"
    cli.main(["eval-tradeoff", *VIDEO,
              "--frames-dir", str(video_dir),
              "--sweep-dir", str(sweep), "--out-dir", str(out)])
    csv = (out / "tradeoff.csv").read_text()
    lines = csv.strip().splitlines()
    assert len(lines) == 3 and lines[0].startswith(
        "run,consistency,det_consistency,separation_bits")
    assert (out / "tradeoff.png").exists()

    # Standalone checkpoints join the same chart via --extra (with or
    # without a sweep dir).
    solo = _save_ckpt(tmp_path, "solo", seed=20)
    out2 = tmp_path / "out_t2"
    cli.main(["eval-tradeoff", *VIDEO,
              "--frames-dir", str(video_dir),
              "--sweep-dir", str(sweep),
              "--extra", f"deep_run:{solo}:6:best",
              "--out-dir", str(out2)])
    csv2 = (out2 / "tradeoff.csv").read_text()
    assert "deep_run," in csv2
    assert len(csv2.strip().splitlines()) == 4


def test_pareto_front():
    from svtpu.evaluation.tradeoff import TradeoffPoint, pareto_front

    pts = [TradeoffPoint("a", 0.9, 1.0, 0.9, {}),
           TradeoffPoint("b", 0.5, 3.0, 0.5, {}),
           TradeoffPoint("c", 0.4, 2.0, 0.4, {}),   # dominated by b
           TradeoffPoint("d", 0.9, 0.5, 0.9, {})]   # dominated by a
    front = pareto_front(pts)
    assert [p.run for p in front] == ["a", "b"]


def test_train_preset_applies_and_explicit_flags_override(monkeypatch):
    """--preset flagship loads the measured preset-v2 recipe's defaults
    (RESULTS.md "Preset v2 measured": L1 brake + strict restart, full
    anneal) while explicit flags still win."""
    captured = {}
    monkeypatch.setattr(cli, "cmd_train",
                        lambda args: captured.update(vars(args)))
    cli.main(["train", "--preset", "flagship", "--video", "chinese_chess",
              "--frames-dir", "unused", "--epochs", "3"])
    assert captured["contrast_on"] == "p"
    assert captured["contextfree_contrast"] is True
    assert captured["margin"] == 3.5
    assert captured["final_temp"] == 0.2        # full anneal, no floor
    assert captured["l1_logits"] == 0.1         # the measured logit brake
    assert captured["restart_min_sep"] == 10.0  # strict basin check
    assert captured["eval_noise_ratio"] == 0.1
    assert captured["select_by"] == "combined"
    assert captured["restart_check_epoch"] == 250
    assert captured["epochs"] == 3          # explicit flag overrides preset

    # The superseded round-3 default stays reproducible as flagship-v1.
    captured.clear()
    cli.main(["train", "--preset", "flagship-v1", "--video",
              "chinese_chess", "--frames-dir", "unused"])
    assert captured["final_temp"] == 0.55
    assert captured["l1_logits"] == 0.0
    assert captured["restart_min_sep"] == 3.0


def test_train_preset_percep(monkeypatch):
    captured = {}
    monkeypatch.setattr(cli, "cmd_train",
                        lambda args: captured.update(vars(args)))
    cli.main(["train", "--preset=percep-flagship",
              "--video", "chinese_chess", "--embeddings", "unused"])
    assert captured["variant"] == "percep"
    assert captured["lstm_residual"] is True
    assert captured["anneal_rate"] == 3e-4


def test_train_preset_unknown():
    with pytest.raises(SystemExit):
        cli.main(["train", "--preset", "nope", "--video", "chinese_chess"])


def test_train_multi_video(tmp_path, video_dir, monkeypatch):
    """--multi trains two videos on one global state axis end-to-end
    (svtpu-only capability, svtpu/data/multi.py)."""
    flags_file = tmp_path / "transition_flags.txt"
    flags_file.write_text(
        "vid_a:\n[16, 32], last_frame = 47, grey_out = 2\n"
        "vid_b:\n[16, 32], last_frame = 47, grey_out = 2\n")
    cli.main(["train", "--multi", f"vid_a={video_dir}",
              "--multi", f"vid_b={video_dir}",
              "--flags-file", str(flags_file),
              "--resolution", "32", "--latent-dim", "8",
              "--epochs", "1", "--batch-size", "4",
              "--sep-aggregate", "min",
              "--save-path", str(tmp_path / "ckpt")])
    assert (tmp_path / "ckpt").exists()

    # ... and the same checkpoint evaluates through the standard CLIs on
    # the global state axis (6 states -> 5 adjacent pairs).
    out = tmp_path / "multi_eval"
    cli.main(["eval-consistency", "--multi", f"vid_a={video_dir}",
              "--multi", f"vid_b={video_dir}",
              "--flags-file", str(flags_file), "--resolution", "32",
              "--latent-dim", "8", "--ckpt", str(tmp_path / "ckpt"),
              "--trials", "2", "--out-dir", str(out)])
    assert (out / "consistency.csv").exists()
    cli.main(["eval-hamming", "--multi", f"vid_a={video_dir}",
              "--multi", f"vid_b={video_dir}",
              "--flags-file", str(flags_file), "--resolution", "32",
              "--latent-dim", "8", "--ckpt", str(tmp_path / "ckpt"),
              "--out-dir", str(out)])
    ham = (out / "hamming.csv").read_text().strip().splitlines()
    assert len(ham) == 1 + 5      # header + 5 adjacent global-state pairs


def test_train_multi_video_bad_spec(tmp_path):
    with pytest.raises(SystemExit):
        cli.main(["train", "--multi", "novideodir",
                  "--resolution", "32", "--epochs", "1"])


def test_cli_encode_roundtrip(tmp_path, video_dir):
    """The product operation end-to-end: train 1 epoch, encode the frame
    dir, load the SymbolStore back (svtpu-only; reference has scripts
    per-eval but no symbols export)."""
    from svtpu.data.symbols import SymbolStore

    flags_file = tmp_path / "transition_flags.txt"
    flags_file.write_text("vid_a:\n[16, 32], last_frame = 47, grey_out = 2\n")
    ckpt = tmp_path / "enc_ckpt"
    cli.main(["train", "--video", "vid_a", "--flags-file", str(flags_file),
              "--frames-dir", str(video_dir), "--resolution", "32",
              "--latent-dim", "8", "--epochs", "1", "--batch-size", "4",
              "--save-path", str(ckpt)])
    out = tmp_path / "symbols.npz"
    cli.main(["encode", str(video_dir), "--ckpt", str(ckpt),
              "--latent-dim", "8", "--resolution", "32", "--out", str(out),
              "--video", "vid_a", "--flags-file", str(flags_file),
              "--batch", "16"])
    store = SymbolStore.load(out)
    assert len(store) == 48
    assert store.codes.shape == (48, 8)
    assert set(np.unique(store.codes)) <= {0, 1}
    assert store.labels is not None and store.labels.max() == 2

    # deterministic mode is reproducible
    out2 = tmp_path / "symbols_det.npz"
    cli.main(["encode", str(video_dir), "--ckpt", str(ckpt),
              "--latent-dim", "8", "--resolution", "32",
              "--out", str(out2), "--deterministic"])
    cli.main(["encode", str(video_dir), "--ckpt", str(ckpt),
              "--latent-dim", "8", "--resolution", "32",
              "--out", str(tmp_path / "s3.npz"),
              "--deterministic"])
    np.testing.assert_array_equal(
        SymbolStore.load(out2).codes,
        SymbolStore.load(tmp_path / "s3.npz").codes)


def test_cli_interpolate_random_ckpt(tmp_path, video_dir, monkeypatch):
    """``interpolate --ckpt random`` runs the full encode→slerp→decode
    pipeline on a seeded random init (the environment ships no trained SD
    weights; reference demo ``ldm_embedding_interpol.py:162-184``) and
    writes the grid figure. Shrunk AE config so the CPU suite stays fast."""
    import functools

    import svtpu.config as config_mod
    from svtpu.config import PerceptualConfig

    # ch must stay a multiple of the AE's 32-group GroupNorm.
    small = functools.partial(
        PerceptualConfig, ch=32, ch_mult=(1, 2), num_res_blocks=1,
        resize_wh=(32, 32))
    monkeypatch.setattr(config_mod, "PerceptualConfig", small)
    out = tmp_path / "interp.png"
    cli.main(["interpolate", str(video_dir / "0000000000.jpg"),
              str(video_dir / "0000000047.jpg"), "--ckpt", "random",
              "--steps", "3", "--out", str(out)])
    assert out.exists() and out.stat().st_size > 0
