"""Training/eval engine (reference demonet/engine.py + train.py recipe)."""

from demonet_tpu.engine.state import (  # noqa: F401
    TrainState,
    create_train_state,
    make_lr_schedule,
    make_optimizer,
)
from demonet_tpu.engine.train import (  # noqa: F401
    make_train_step,
    train_one_epoch,
)
from demonet_tpu.engine.evaluate import evaluate, make_predict_step  # noqa: F401
