"""Training core: TrainState, jitted steps, trainer loop, GAN loop."""

from .loop import Trainer, TrainerConfig
from .state import TrainState, create_train_state
from .steps import make_eval_step, make_predict_step, make_train_step

__all__ = ['Trainer', 'TrainerConfig', 'TrainState', 'create_train_state',
           'make_eval_step', 'make_predict_step', 'make_train_step']
