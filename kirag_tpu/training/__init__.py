from kirag_tpu.training.loader import DataLoader
from kirag_tpu.training.trainer import BaseTrainer, TrainerConfig
from kirag_tpu.training.aligner import AlignerTrainer, in_batch_contrastive_loss

__all__ = [
    "DataLoader",
    "BaseTrainer",
    "TrainerConfig",
    "AlignerTrainer",
    "in_batch_contrastive_loss",
]
