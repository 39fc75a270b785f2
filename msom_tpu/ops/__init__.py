from msom_tpu.ops.bc import BC, pad, pad_zeta_slip
from msom_tpu.ops import stencil, stretch, tridiag

__all__ = ["BC", "pad", "pad_zeta_slip", "stencil", "stretch", "tridiag"]
