from aline_tpu.eval.eig import compute_eig_from_history, eval_boed
from aline_tpu.eval.traces import get_traces
from aline_tpu.eval.metrics import compute_ll, compute_rmse
