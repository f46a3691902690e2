"""Hand-written Pallas TPU kernels for the hot paths.

Design notes on kernel choice: Mosaic (the Pallas TPU compiler) has no
vectorized arbitrary-gather primitive, so the data-dependent image/volume
lookups (projective data association, TSDF sampling) go through XLA's
gather lowering, which is the supported path. What Pallas buys is control
over the *reduction* and *stencil* structure:

* ``reduce.py`` — the fused ICP normal-equations reduction (the
  reference's flagship ``reduceKernel``): per-tile masked Gram products
  on the MXU with a single VMEM accumulator across the grid.
* ``bilateral.py`` — the 5x5 bilateral depth filter as a VMEM-resident
  stencil with halo rows.

Each kernel is validated buffer-by-buffer against the jnp oracle in
tests/test_pallas.py (interpret mode on CPU, compiled on TPU).

Measured on the real chip (PROFILE.md §4-5, profiles/r2_mosaic_probe
.json): the Mosaic gather limits are confirmed empirically (flat takes
rejected, sublane gathers crash the compiler), and the Pallas reduction
TIES the XLA Gram contraction (2537 vs 2511 us) — so the Pallas tier is
a supported alternative backend, not the default.
"""

from slambench_tpu.ops.pallas.reduce import reduce_track_pallas
from slambench_tpu.ops.pallas.bilateral import bilateral_filter_pallas
