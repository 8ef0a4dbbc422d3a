"""Training: optimizers, jitted steps, loops, curriculum."""

from mgr_tpu.train.optimizer import keras_adam, apply_maxnorm  # noqa: F401
from mgr_tpu.train.step import (  # noqa: F401
    TrainState,
    create_train_state,
    make_eval_step,
    make_predict_step,
    make_train_step,
)
