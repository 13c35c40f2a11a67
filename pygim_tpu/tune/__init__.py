"""Autotuning: config search space DSL, TPU roofline cost model, and the
per-graph autotuner (analog of utils/autotuner.py + utils/space.py)."""

from pygim_tpu.tune.space import Concat, For, Product, Space, Table, Unit  # noqa: F401
from pygim_tpu.tune.autotuner import (  # noqa: F401
    DEFAULT_SPACE,
    HYBRID_SPACE,
    TuneResult,
    autotune,
    plan_statistics,
    prepare_tuned,
)
from pygim_tpu.tune.cost_model import TpuCostModel, predict_spmm_time  # noqa: F401
from pygim_tpu.tune.dist import DistPlan, enumerate_dist, halo_statistics  # noqa: F401
