"""Multi-device distribution: 2D sp×ds mesh SpMM and halo-exchange scaling.

TPU-native replacement of the reference's rank-level orchestration
(SURVEY.md §2.3/§2.4): the (sp, ds) rank grid becomes a
``jax.sharding.Mesh`` with axes ``("sp", "ds")``; the host-side merge
(memadd_2D/memcpy_2D, spmm_mul_csr.c:481-547) becomes an on-device ``psum``
over the ``sp`` axis riding ICI — eliminating the reference's biggest
serial bottleneck ("alignment_time").

Backend-mode mapping (reference backend → here):

* spmm_default group   → ``sp_parts × ds_parts`` mesh, this module.
* spmm_grande          → ``sp_parts × ds_parts`` with the sparse part
  replicated inside each ``ds`` row — identical math; a planner point, not
  a separate backend (SURVEY.md §7 non-goals).
* spmm_multigroup      → multiple row blocks per chip (the scan/grid inside
  each shard already packs many virtual tiles per device).
* spmv_sparseP         → degenerate ``ds = hidden`` config point.
"""

from pygim_tpu.parallel.mesh import make_mesh  # noqa: F401
from pygim_tpu.parallel.spmm_2d import PreparedSpmm2D, prepare_spmm_2d  # noqa: F401
