from aline_tpu.eval.al_curves import al_rollout_curves, compare_strategies
from aline_tpu.eval.eig import (compute_eig_from_history, eval_boed,
    eval_eig_from_history)
from aline_tpu.eval.eig_losses import (
    compute_seq_logprobs,
    nmc_loss,
    pce_loss,
    pce_loss_score_gradient,
)
from aline_tpu.eval.gp_al_baselines import (
    ACQUISITION_FUNCTIONS,
    active_learning_with_gp,
    compare_acquisition_methods,
    fit_gp,
    gp_posterior,
)
from aline_tpu.eval.metrics import compute_ll, compute_rmse
from aline_tpu.eval.mle_losses import (
    chamfer_nmle_loss,
    l2_distance,
    nmle_loss,
    set_nmle_loss,
    sorted_nmle_loss,
)
from aline_tpu.eval.traces import get_traces
