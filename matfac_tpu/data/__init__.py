from matfac_tpu.data.csr import RatingMatrix
from matfac_tpu.data.dataset import Data

__all__ = ["RatingMatrix", "Data"]
