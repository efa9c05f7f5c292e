from aline_tpu.distributions.gmm import (
    MixtureOfGaussians,
    gmm_log_prob,
    gmm_mean,
    gmm_sample,
    gmm_variance,
)
from aline_tpu.distributions.truncated_normal import LowerTruncatedNormal
from aline_tpu.distributions.censored_sigmoid_normal import CensoredSigmoidNormal
