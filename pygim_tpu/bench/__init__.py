"""Experiment harness: config points, result ledger, sweep runner, CSV
export — the utils/experiment.py + utils/helpers.py + parse_results.py
capability, without subprocess-per-run or per-config native builds (JIT
specialization replaces the reference's cmake flag matrix, SURVEY.md §5.6).
"""

from pygim_tpu.bench.experiment import Experiment, run_experiments  # noqa: F401
from pygim_tpu.bench.runners import run_inference_benchmark, run_spmm_benchmark  # noqa: F401
from pygim_tpu.bench.parse_results import results_to_csv  # noqa: F401
