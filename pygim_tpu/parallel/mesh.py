"""Device-mesh construction for the (sp, ds) rank grid.

The reference maps physical rank r to tile (r // ds_parts, r % ds_parts)
(spmm_mul_csr.c:344-345); here the same 2D grid is a named mesh. On real
hardware the ``sp`` axis (which carries the psum reduction) should be laid
out on the faster ICI dimension.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    sp_parts: int, ds_parts: int, devices: Optional[Sequence] = None
) -> Mesh:
    if devices is None:
        devices = jax.devices()
    need = sp_parts * ds_parts
    if len(devices) < need:
        raise ValueError(
            f"need {need} devices for sp={sp_parts} ds={ds_parts}, "
            f"have {len(devices)}"
        )
    grid = np.asarray(devices[:need]).reshape(sp_parts, ds_parts)
    return Mesh(grid, axis_names=("sp", "ds"))
