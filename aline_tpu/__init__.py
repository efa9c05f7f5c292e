"""ALINE-TPU: a TPU-native framework for joint amortized Bayesian inference
and active data acquisition (ALINE, NeurIPS 2025), built on JAX/XLA/Pallas.

This is a ground-up re-design of the capabilities of the reference PyTorch
implementation (huangdaolang/ALINE) for TPU hardware:

* static-shape token buffers with role flags instead of dynamically
  shrinking/growing query/context pools (reference: tasks/base_task.py:103-154),
* fully on-device `lax.scan` experiment rollouts (reference: the Python
  T-step loop in train_aline.py:80-110),
* vmapped simulators with batched linear algebra (reference: the per-batch
  Cholesky loop in tasks/gaussian_process.py:366-417),
* mesh-sharded sPCE/sNMC contrastive evaluation over the L axis
  (reference: single-device loss/eig.py:154-208),
* a Pallas block-masked flash-attention kernel for the ALINE attention
  pattern (reference: model/encoder.py:7-46,83-126).

Subpackages
-----------
- ``aline_tpu.config``        composable dataclass config with CLI overrides
- ``aline_tpu.distributions`` GMM / truncated-normal / censored-sigmoid-normal
- ``aline_tpu.tasks``         simulators (GP, location finding, CES, ...)
- ``aline_tpu.models``        embedder / encoder / heads / Aline / baselines
- ``aline_tpu.ops``           attention (naive + Pallas), masks, math ops
- ``aline_tpu.parallel``      mesh + collectives helpers
- ``aline_tpu.train``         train state, optimizer phases, training loop
- ``aline_tpu.eval``          sPCE/sNMC bounds, rollout traces, AL curves
"""

__version__ = "0.1.0"

import os as _os

if _os.environ.get("ALINE_PLATFORM"):
    # Hosted environments may pin the JAX platform from sitecustomize
    # (ignoring JAX_PLATFORMS); this knob lets any CLI force a backend,
    # e.g. ALINE_PLATFORM=cpu to run evals off-chip while a training job
    # owns the TPU. Must run before the first device use; importing
    # aline_tpu from an entry point satisfies that.
    import jax as _jax

    _jax.config.update("jax_platforms", _os.environ["ALINE_PLATFORM"])
