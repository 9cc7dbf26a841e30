"""Training runtime: optimizer, sharded train step, checkpoints, trainer loop."""

from motion324_tpu.training.loss import coord_mse_loss  # noqa: F401
from motion324_tpu.training.optimizer import create_optimizer, create_lr_schedule  # noqa: F401
from motion324_tpu.training.train_step import TrainState, build_train_step  # noqa: F401
