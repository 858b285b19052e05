from matfac_tpu.eval.metrics import Evaluator

__all__ = ["Evaluator"]
