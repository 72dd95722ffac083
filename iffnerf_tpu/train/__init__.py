"""TensoRF training layer (reference train.py)."""

from iffnerf_tpu.train.trainer import (
    SimpleSampler,
    TrainState,
    make_train_step,
    reconstruction,
)
