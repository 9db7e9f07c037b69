"""Metrics and small stat helpers.

Mirrors gcn/utils.py:507-529 (Averager, calc_f1) and gcn/stats.py:3-14 (Stat).
"""

from __future__ import annotations

import numpy as np
from sklearn.metrics import f1_score


def calc_f1(y_pred: np.ndarray, y_true: np.ndarray,
            multitask: bool) -> tuple[float, float]:
    """Micro/macro F1.  Multitask thresholds sigmoid outputs at 0.5;
    single-label argmaxes (gcn/utils.py:521-529)."""
    y_pred = np.asarray(y_pred).copy()
    y_true = np.asarray(y_true)
    if multitask:
        y_pred[y_pred > 0.5] = 1
        y_pred[y_pred <= 0.5] = 0
    else:
        y_true = np.argmax(y_true, axis=1)
        y_pred = np.argmax(y_pred, axis=1)
    return (f1_score(y_true, y_pred, average="micro"),
            f1_score(y_true, y_pred, average="macro"))


class Averager:
    """Trailing-window mean (gcn/utils.py:507-518)."""

    def __init__(self, window_size: int):
        self.window_size = window_size
        self.window: list[float] = []

    def add(self, n) -> None:
        self.window.append(float(n))
        if len(self.window) > self.window_size:
            self.window = self.window[1:]

    def mean(self) -> float:
        return float(np.mean(self.window)) if self.window else float("nan")


class Stat:
    """Accumulates arrays across runs; mean/std elementwise
    (gcn/stats.py:3-14)."""

    def __init__(self):
        self.vals: list[np.ndarray] = []

    def add(self, v) -> None:
        self.vals.append(np.asarray(v))

    def mean(self) -> np.ndarray:
        return np.mean(np.stack(self.vals), axis=0)

    def std(self) -> np.ndarray:
        return np.std(np.stack(self.vals), axis=0)
