from msfno_tpu.training.trainer import Trainer, TrainState  # noqa: F401
from msfno_tpu.training.losses import get_loss  # noqa: F401
from msfno_tpu.training.optim import create_optimizer  # noqa: F401
from msfno_tpu.training.partition import (  # noqa: F401
    film_trainable_predicate,
    merge_params,
    split_params,
)
