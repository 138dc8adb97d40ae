"""Checkpointing: orbax-backed, best-by-metric.

Mirrors the reference's policy of saving a best-model dict
``{epoch, model_state_dict, optimizer_state_dict, consistency_score}``
(``contrastive_RBVAE_train.py:668-673``) — here with mid-training resume
support, which the live reference pipeline lacks (SURVEY.md §5.4).
"""
from __future__ import annotations

import json
import os
from pathlib import Path
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


class BestCheckpointer:
    """Keeps the best checkpoint (by a scalar metric) plus the latest one."""

    def __init__(self, directory: str | Path, mode: str = "max"):
        self.directory = Path(directory).absolute()
        self.directory.mkdir(parents=True, exist_ok=True)
        self.mode = mode
        self.best_metric: Optional[float] = None
        # Optional lexicographic selection key (trainer passes
        # (signed_metric, det_consistency, mean_sep, epoch)) so a run whose
        # scalar metric never improves still promotes its most-converged
        # epoch instead of keeping the first one (queue15 degeneracy,
        # RESULTS.md "Multi-video"; the reference's scalar-only policy is
        # contrastive_RBVAE_train.py:662-673).
        self.best_key: Optional[tuple] = None
        self._ckpt = ocp.PyTreeCheckpointer()

    def _is_better(self, metric: float,
                   sel_key: Optional[tuple] = None) -> bool:
        if sel_key is not None:
            return self.best_key is None or tuple(sel_key) > self.best_key
        if self.best_metric is None:
            return True
        return (metric > self.best_metric if self.mode == "max"
                else metric < self.best_metric)

    def save(self, tree: Any, *, epoch: int, metric: float,
             sel_key: Optional[tuple] = None,
             extra: Optional[dict] = None) -> bool:
        """Save ``latest``; promote to ``best`` if the metric improved
        (lexicographically on ``sel_key`` when given, else strict scalar).
        Returns True if this became the new best."""
        meta = {"epoch": int(epoch), "metric": float(metric),
                **(extra or {})}
        # One device→host readback per save() call, shared by the latest
        # and best writes. Through a thin device link (axon relay) the
        # readback dominates the save; a val_loss-selected run improves
        # nearly every early epoch, and the old per-_write conversion made
        # that a DOUBLE full param+opt_state readback per epoch (measured:
        # the triplet_p arm crawled at ~30 s/epoch during its early save
        # storm vs ~2 s once improvements thinned).
        host_tree = jax.tree_util.tree_map(np.asarray, tree)
        self._write(host_tree, meta, "latest")
        if self._is_better(metric, sel_key):
            self.best_metric = float(metric)
            if sel_key is not None:
                self.best_key = tuple(sel_key)
            self._write(host_tree, meta, "best")
            return True
        return False

    def _write(self, host_tree, meta, name):
        path = self.directory / name
        self._ckpt.save(path, host_tree, force=True)
        (self.directory / f"{name}.json").write_text(json.dumps(meta))

    def restore(self, name: str = "best", target=None):
        """Restore a checkpoint. Pass ``target`` (a matching pytree, e.g. a
        fresh TrainState's ``{"params", "opt_state"}``) to recover custom
        node types like optax NamedTuples — orbax otherwise returns plain
        dicts."""
        path = self.directory / name
        if target is not None:
            host_target = jax.tree_util.tree_map(np.asarray, target)
            tree = self._ckpt.restore(path, item=host_target)
        else:
            tree = self._ckpt.restore(path)
        meta = json.loads((self.directory / f"{name}.json").read_text())
        return tree, meta

    def exists(self, name: str = "best") -> bool:
        return (self.directory / name).exists()


def save_params_npz(params: Any, path: str | Path) -> None:
    """Portable single-file export of a param pytree.

    Keys are '/'-joined tree paths, so the archive is self-describing and
    survives environments without orbax (the reference's analogue is a
    torch ``state_dict`` in a ``.pt``; this is the dependency-free JAX
    equivalent, used to commit small trained artifacts under
    ``results/``)."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    out = {}
    for keypath, leaf in flat:
        key = "/".join(str(getattr(k, "key", getattr(k, "idx", k)))
                       for k in keypath)
        out[key] = np.asarray(leaf)
    np.savez_compressed(path, **out)


def load_params_npz(path: str | Path) -> dict:
    """Inverse of :func:`save_params_npz`: nested dict keyed by path
    segments."""
    with np.load(path) as z:
        tree: dict = {}
        for key in z.files:
            node = tree
            parts = key.split("/")
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = z[key]
    return tree
