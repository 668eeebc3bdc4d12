from .models import (
    MODEL_BUILDERS,
    SEED,
    assemble,
    model_submission,
    train_metrics,
)

__all__ = [
    "MODEL_BUILDERS",
    "SEED",
    "assemble",
    "model_submission",
    "train_metrics",
]
