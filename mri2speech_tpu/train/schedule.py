"""Host-side LR controllers.

ReduceLROnPlateau reproduces the torch scheduler semantics used by both
trainers (`train_mri_acoustic_model.py:234` factor 0.5 / patience 5 /
min_lr 1e-6; `train.py:78-79` factor 0.1 / patience 4). The LR itself is a
jit-input (via `optax.inject_hyperparams`), so plateau reductions never trigger
recompilation.

The reference's DDP scheduler bug (each rank stepping on a different val error,
`train.py:258-259`) cannot occur here: in the single-program SPMD model there is
exactly one host-side scheduler driving the jitted step.
"""
from __future__ import annotations

from typing import Dict


class ReduceLROnPlateau:
    """mode='min' plateau scheduler with torch-compatible behavior.

    step(metric) -> new lr. A reduction happens after `patience` consecutive
    non-improving epochs (strict `<` comparison against best, like torch's
    default threshold mode with threshold=0 would approximate; torch uses
    rel threshold 1e-4 — replicated).
    """

    def __init__(
        self,
        init_lr: float,
        factor: float = 0.1,
        patience: int = 10,
        min_lr: float = 0.0,
        threshold: float = 1e-4,
    ) -> None:
        self.lr = float(init_lr)
        self.factor = float(factor)
        self.patience = int(patience)
        self.min_lr = float(min_lr)
        self.threshold = float(threshold)
        self.best = float("inf")
        self.num_bad_epochs = 0

    def step(self, metric: float) -> float:
        if metric < self.best * (1.0 - self.threshold):
            self.best = float(metric)
            self.num_bad_epochs = 0
        else:
            self.num_bad_epochs += 1
        if self.num_bad_epochs > self.patience:
            self.lr = max(self.lr * self.factor, self.min_lr)
            self.num_bad_epochs = 0
        return self.lr

    def state_dict(self) -> Dict[str, float]:
        return {
            "lr": self.lr,
            "best": self.best,
            "num_bad_epochs": self.num_bad_epochs,
        }

    def load_state_dict(self, state: Dict[str, float]) -> None:
        self.lr = float(state["lr"])
        self.best = float(state["best"])
        self.num_bad_epochs = int(state["num_bad_epochs"])
