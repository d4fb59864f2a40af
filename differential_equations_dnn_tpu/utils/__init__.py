"""Utilities: timing, run manifests, artifact IO."""

from differential_equations_dnn_tpu.utils.timing import fn_timer, Timer
from differential_equations_dnn_tpu.utils.manifest import parameters_summary
from differential_equations_dnn_tpu.utils.artifacts import save_array, load_array, results_dir

__all__ = [
    "fn_timer",
    "Timer",
    "parameters_summary",
    "save_array",
    "load_array",
    "results_dir",
]
