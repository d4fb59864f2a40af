"""Validation metrics — the reference's acceptance criterion is
sklearn.metrics.mean_absolute_error against the analytic solution
(heat.py:232, simple_ode.py:194, fredholm.py:196, fitzhugh_nagumo.py:238).
Implemented directly (identical definition) to avoid the sklearn dependency
on the compute path."""

import numpy as np


def mean_absolute_error(y_true, y_pred) -> float:
    y_true = np.asarray(y_true)
    y_pred = np.asarray(y_pred)
    return float(np.mean(np.abs(y_true - y_pred)))


def l2_error(y_true, y_pred, relative: bool = True) -> float:
    y_true = np.asarray(y_true)
    y_pred = np.asarray(y_pred)
    err = np.linalg.norm(y_true - y_pred)
    if relative:
        denom = np.linalg.norm(y_true)
        return float(err / denom) if denom > 0 else float(err)
    return float(err)
