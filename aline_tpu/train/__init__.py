from aline_tpu.train.checkpoint import load_checkpoint, save_checkpoint
from aline_tpu.train.loop import Trainer
from aline_tpu.train.loss import reinforce_losses, total_loss
from aline_tpu.train.optimizer import (
    build_optimizer,
    clip_by_inf_norm,
    phase_for_epoch,
    predictor_partition,
)
from aline_tpu.train.rollout import RolloutOutputs, rollout
