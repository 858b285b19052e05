from matfac_tpu.solvers.sgd import SGDSolver
from matfac_tpu.solvers.als import ALSSolver
from matfac_tpu.solvers.ccd import CCDPPSolver, CCDSolver

__all__ = ["SGDSolver", "ALSSolver", "CCDPPSolver", "CCDSolver"]
