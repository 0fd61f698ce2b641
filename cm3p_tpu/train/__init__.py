from .checkpoint import CheckpointManager, load_model, save_model
from .metrics import MetricAccumulator
from .muon import default_muon_label_fn, muon, scale_by_muon, zeropower_via_newtonschulz5
from .train_state import TrainState, create_train_state, make_eval_step, make_train_step, shard_train_step
from .trainer import Trainer

__all__ = [
    "CheckpointManager",
    "MetricAccumulator",
    "TrainState",
    "Trainer",
    "create_train_state",
    "default_muon_label_fn",
    "load_model",
    "make_eval_step",
    "make_train_step",
    "muon",
    "save_model",
    "scale_by_muon",
    "shard_train_step",
    "zeropower_via_newtonschulz5",
]
