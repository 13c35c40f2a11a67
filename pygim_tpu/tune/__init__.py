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
from pygim_tpu.tune.cost_model import (  # noqa: F401
    TpuCostModel,
    calibrate_from_phases,
    measure_constants,
    predict_spmm_time,
)
from pygim_tpu.tune.dist import DistPlan, enumerate_dist, halo_statistics  # noqa: F401
