from msom_tpu.models.qg import (QGConstants, QGState, build_constants,
                                init_state, make_step, kinetic_energy)

__all__ = ["QGConstants", "QGState", "build_constants", "init_state",
           "make_step", "kinetic_energy"]
