from matfac_tpu.train.loop import TrainLoop, TrainReport, train_model

__all__ = ["TrainLoop", "TrainReport", "train_model"]
