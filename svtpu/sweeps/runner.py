"""Sweep execution: W&B Bayesian sweeps when available, seeded local random
search otherwise (zero-egress fallback the reference lacks).

Mirrors the reference sweep entry points
(``contrastive_RBVAE_wandb_sweep.py:20-147, 156-257``): each trial builds
datasets/model/trainer from the sampled config, trains, logs the optimized
metric, and saves the best model per run.
"""
from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, Optional

import numpy as np

from svtpu.config import TrainConfig, VideoMeta, rbvae_variant
from svtpu.data.segments import split_segments
from svtpu.sweeps.spaces import METRIC, SPACES, sample, to_wandb_config
from svtpu.training.trainer import Trainer


def train_with_config(config: Dict, variant: str, store,
                      video_meta: VideoMeta,
                      save_dir: Optional[str] = None,
                      run_name: str = "run",
                      compute_dtype: str = "bfloat16") -> Dict:
    """One sweep trial: config dict → trained model → metrics.

    Returns ``{"best_consistency_score": ..., "best_val_loss": ...,
    "history": ...}``.
    """
    splits = split_segments(video_meta.state_segments())
    input_hw = tuple(store.item_shape[:2])
    in_ch = store.item_shape[2]
    # Sweep names may be space variants of a model family (e.g.
    # "contrastive_z" sweeps the contrastive model with contrast_on="z").
    model_variant = {"contrastive_z": "contrastive",
                     "contrastive_p": "contrastive",
                     "percep_p": "percep"}.get(variant, variant)
    mkw = {}
    if "lstm_layers" in config:  # architecture factor (percep_p space)
        mkw["lstm_layers"] = int(config["lstm_layers"])
    if "lstm_residual" in config:  # round-3 architecture factor
        mkw["lstm_residual"] = bool(config["lstm_residual"])
    mcfg = rbvae_variant(model_variant, latent_dim=int(config["latent_dim"]),
                         input_hw=input_hw, in_channels=in_ch,
                         out_channels=in_ch, compute_dtype=compute_dtype,
                         **mkw)
    # num_steps_to_update derives from total steps / num_temp_updates
    # (``contrastive_RBVAE_wandb_sweep.py:92-97``). Pairs per epoch =
    # ceil(longest state / 2); steps = ceil(pairs / batch).
    n_train_pairs = -(-max(len(s) for s in splits.train) // 2)
    steps_per_epoch = max(1, -(-n_train_pairs // int(config["batch_size"])))
    total_steps = int(config["num_epochs"]) * steps_per_epoch
    nstu = max(1, total_steps // int(config["num_temp_updates"]))

    tcfg = TrainConfig(
        batch_size=int(config["batch_size"]),
        num_epochs=int(config["num_epochs"]),
        learning_rate=float(config["learning_rate"]),
        init_temperature=float(config["init_temperature"]),
        final_temperature=float(config["final_temperature"]),
        anneal_rate=float(config["anneal_rate"]),
        num_steps_to_update=nstu,
        bernoulli_p=float(config["bernoulli_p"]),
        noise_ratio=float(config.get("noise_ratio", 0.1)),
        margin=float(config["margin"]),
        alpha=float(config["alpha"]),
        beta_kl=float(config["beta_kl"]),
        objective=str(config["objective"]),
        select_by=str(config["select_by"]),
        contrast_on=str(config.get("contrast_on", "h")),
        contextfree_contrast=bool(config.get("contextfree_contrast", False)),
        eval_noise_ratio=(None if config.get("eval_noise_ratio") is None
                          else float(config["eval_noise_ratio"])),
        sep_target=float(config.get("sep_target", 3.0)),
    )
    trainer = Trainer(mcfg, tcfg, store, splits, video_meta.flags)
    save_path = (str(Path(save_dir) / f"best_model_{run_name}")
                 if save_dir else None)
    hist = trainer.train(num_epochs=tcfg.num_epochs, save_path=save_path)
    best_cons = max((v.get("consistency_score", 0.0)
                     for v in hist["val_losses"]), default=0.0)
    best_val = min((v.get("total_loss", np.inf)
                    for v in hist["val_losses"]), default=np.inf)
    best_comb = max((v.get("combined_score", 0.0)
                     for v in hist["val_losses"]), default=0.0)
    best_sep = max((v.get("state_separation", 0.0)
                    for v in hist["val_losses"]), default=0.0)
    summary = {"best_consistency_score": float(best_cons),
               "best_val_loss": float(best_val),
               "best_combined_score": float(best_comb),
               "best_separation": float(best_sep)}
    if save_path:
        (Path(save_path).parent / f"{run_name}_config.json").write_text(
            json.dumps({"config": config, **summary}, indent=2))
    return {**summary, "history": hist, "save_path": save_path}


def run_sweep(variant: str, store, video_meta: VideoMeta,
              count: int = 10, seed: int = 0,
              save_dir: Optional[str] = None,
              use_wandb: bool = True,
              epochs_override: Optional[int] = None) -> Dict:
    """Run ``count`` trials over the variant's space.

    With W&B installed: creates the Bayesian sweep and runs an agent
    (method/metric per the reference). Otherwise: seeded random search.
    """
    space = dict(SPACES[variant])
    if epochs_override is not None:
        space["num_epochs"] = ("const", int(epochs_override))
    metric = METRIC[variant]

    try:
        import wandb  # noqa: F401
        has_wandb = use_wandb
    except ImportError:
        has_wandb = False

    if has_wandb:
        import wandb

        sweep_id = wandb.sweep(to_wandb_config(space, metric),
                               project=f"svtpu_{variant}_sweep")

        def agent_fn():
            run = wandb.init()
            cfg = dict(run.config)
            res = train_with_config(cfg, variant, store, video_meta,
                                    save_dir, run_name=run.name or run.id)
            wandb.log({metric[0]: res[metric[0]]})
            if res["save_path"]:
                wandb.save(res["save_path"] + "*")
            run.finish()

        wandb.agent(sweep_id, function=agent_fn, count=count)
        return {"sweep_id": sweep_id}

    # Local random search.
    import time

    rng = np.random.default_rng(seed)
    best, best_cfg, trials = None, None, []
    maximize = metric[1] == "maximize"
    for t in range(count):
        cfg = sample(space, rng)          # always advance the rng so trial
        #                                   t's config is seed-stable
        done = (Path(save_dir) / f"local_{t}_config.json"
                if save_dir else None)
        if done and done.exists():
            # Resume an interrupted sweep: reuse the recorded summary — but
            # only if the recorded config matches what this (seed, space,
            # trial index) re-samples; otherwise the score would be silently
            # attributed to a config that never ran.
            prev = json.loads(done.read_text())
            score = prev.get(metric[0])
            prev_cfg = prev.get("config")
            if score is not None and prev_cfg is not None \
                    and prev_cfg != cfg:
                print(f"[trial {t}/{count}] recorded config differs from "
                      f"re-sampled config (seed/space/count changed?) — "
                      f"retraining", flush=True)
                score = None
            if score is not None:
                print(f"[trial {t}/{count}] resumed: {metric[0]}={score:.4f}",
                      flush=True)
                trials.append({"config": cfg, metric[0]: score})
                if best is None or (score > best if maximize
                                    else score < best):
                    best, best_cfg = score, cfg
                continue
        brief = {k: (round(v, 5) if isinstance(v, float) else v)
                 for k, v in cfg.items()}
        print(f"[trial {t}/{count}] {brief}", flush=True)
        t0 = time.time()
        res = train_with_config(cfg, variant, store, video_meta, save_dir,
                                run_name=f"local_{t}")
        score = res[metric[0]]
        trials.append({"config": cfg, metric[0]: score})
        if best is None or (score > best if maximize else score < best):
            best, best_cfg = score, cfg
        print(f"[trial {t}/{count}] {metric[0]}={score:.4f} "
              f"(best {best:.4f}) in {time.time() - t0:.0f}s", flush=True)
    result = {"best": best, "best_config": best_cfg, "trials": trials,
              "metric": metric[0]}
    if save_dir:
        Path(save_dir).mkdir(parents=True, exist_ok=True)
        (Path(save_dir) / "sweep_results.json").write_text(
            json.dumps(result, indent=2, default=str))
    return result
