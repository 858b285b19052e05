from matfac_tpu.models.base import (MFState, ModelMF, ModelMFBias,
                                    init_state)
from matfac_tpu.models.longtail import (ModelInvPopMF, ModelDropoutSigmoid,
                                        ModelPoissonDropout)

__all__ = ["MFState", "ModelMF", "ModelMFBias", "init_state",
           "ModelInvPopMF", "ModelDropoutSigmoid", "ModelPoissonDropout"]
