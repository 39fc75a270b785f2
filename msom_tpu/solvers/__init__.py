from msom_tpu.solvers.mg import (MGStats, solve_layered, solve_poisson,
                                 solve_bt, build_layered_coeffs)

__all__ = ["MGStats", "solve_layered", "solve_poisson", "solve_bt",
           "build_layered_coeffs"]
