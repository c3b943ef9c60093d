from . import loss, state, step  # noqa: F401
from .loop import MetricsLogger, TrainResult, run_training  # noqa: F401
from .state import TrainState, create_state  # noqa: F401
from .step import StepMetrics, TrainBatch, eval_step, train_step  # noqa: F401
