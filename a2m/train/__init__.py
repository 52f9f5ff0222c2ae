from a2m.train.checkpoint import (CheckpointManager, load_loss_history,
                                  save_loss_history)
from a2m.train.controller import DynamicGANTraining, LabelParams
from a2m.train.loop import Trainer
from a2m.train.train_step import (NetState, init_states, make_optimizer,
                                  make_train_steps, normalize_pose_device,
                                  set_lr, smooth_labels)

__all__ = ['CheckpointManager', 'load_loss_history', 'save_loss_history',
           'DynamicGANTraining', 'LabelParams', 'Trainer', 'NetState',
           'init_states', 'make_optimizer', 'make_train_steps',
           'normalize_pose_device', 'set_lr', 'smooth_labels']
