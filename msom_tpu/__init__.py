"""msom_tpu — a TPU-native multi-scale ocean dynamical core.

A brand-new JAX/XLA/Pallas implementation of the capabilities of the
bderembl/msom family of finite-difference ocean solvers (multi-layer
quasi-geostrophic msqg, planetary-geostrophic mspg, nodal qg-node), designed
TPU-first: functional state pytrees, static-shape stencils, batched vertical
(layer) linear algebra, geometric multigrid with order-independent smoothers,
and `jax.sharding` domain decomposition over device meshes.

This is not a port of the Basilisk-C reference — see SURVEY.md for the
structural map of the reference and how each capability is re-designed here.
"""

__version__ = "0.1.0"

from msom_tpu.ops.bc import BC

__all__ = ["BC", "__version__"]
