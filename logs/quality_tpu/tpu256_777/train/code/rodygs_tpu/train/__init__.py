from .losses import LossTerm, MultiLoss  # noqa: F401
from .trainer_dynamic import DynTrainer, DynTrainerConfig  # noqa: F401
from .trainer_joint import RoDyGSTrainer  # noqa: F401
from .trainer_static import (  # noqa: F401
    FrameBatch, StaticTrainerConfig, ThreeDGSTrainer)
