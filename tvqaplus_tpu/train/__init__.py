from tvqaplus_tpu.train.state import (
    TrainState,
    create_train_state,
    PlateauScheduler,
    save_checkpoint,
    load_checkpoint,
)
from tvqaplus_tpu.train.metrics import MetricsLogger
from tvqaplus_tpu.train.loop import Trainer
