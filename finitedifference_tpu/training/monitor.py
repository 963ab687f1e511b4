"""Training monitor: best-checkpoint saving, patience-based early stop,
loss-history tracking.

Role of the reference's TrainingMonitor (train_utils.py:21-85): persist
{epoch, model params, optimizer state, loss history} whenever the
validation criterion improves, stop after `patience` epochs without
improvement, and resume from a checkpoint path. Serialization is
flax.serialization msgpack instead of torch.save; scalar histories land
in a sidecar .json so they stay human-readable.
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional

import flax.serialization
import jax
import numpy as np


class TrainingMonitor:
    def __init__(self, model_path: str, patience: int):
        self.model_path = model_path
        self.patience = patience
        self.best_crit = float("inf")
        self.its_since_improvement = 0
        self.epoch = 0
        self.train_losses: list = []
        self.test_crits: list = []

    def check_for_completion(self, train_loss: float, test_crit: float,
                             state: Any) -> bool:
        """Record one epoch; checkpoint on improvement; True = stop now."""
        self.epoch += 1
        self.its_since_improvement += 1
        self.train_losses.append(float(train_loss))
        self.test_crits.append(float(test_crit))
        if test_crit < self.best_crit:
            self.best_crit = float(test_crit)
            self.its_since_improvement = 0
            self.save_checkpoint(state)
        return self.its_since_improvement > self.patience

    def save_checkpoint(self, state: Any) -> None:
        os.makedirs(os.path.dirname(self.model_path) or ".", exist_ok=True)
        with open(self.model_path, "wb") as f:
            f.write(flax.serialization.to_bytes(state))
        meta = {
            "epoch": self.epoch,
            "best_crit": self.best_crit,
            "train_losses": self.train_losses,
            "test_crits": self.test_crits,
        }
        with open(self.model_path + ".json", "w") as f:
            json.dump(meta, f)

    def load_from_path(self, path: str, state_template: Any) -> Any:
        """Restore params/opt state into a pytree of the same structure."""
        with open(path, "rb") as f:
            state = flax.serialization.from_bytes(state_template, f.read())
        meta_path = path + ".json"
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                meta = json.load(f)
            self.epoch = meta["epoch"]
            self.train_losses = meta["train_losses"]
            self.test_crits = meta["test_crits"]
            self.best_crit = min(self.test_crits) if self.test_crits \
                else float("inf")
        return state


def load_checkpoint(path: str, state_template: Any) -> Any:
    with open(path, "rb") as f:
        return flax.serialization.from_bytes(state_template, f.read())
