from .state import TrainState, make_optimizer, linear_warmup_schedule  # noqa: F401
from .dr_trainer import DRTrainer  # noqa: F401
from .rr_trainer import RRTrainer  # noqa: F401
