"""Backend preflight: ride out transient axon-tunnel outages.

The TPU tunnel relay can be briefly down (fast UNAVAILABLE at attach) or
wedge a brand-new client (hang at ~0% CPU forever). Both failure modes
poison jax's backend cache if they happen in-process, so the probe runs
in a SUBPROCESS with a hard timeout; the caller only proceeds once one
probe succeeds (or the budget is spent — then the real attach surfaces
the actual error). Entry points call this before their first jax device
touch so queued jobs wait out an outage instead of burning retries.
"""
from __future__ import annotations

import os
import subprocess
import sys
import time

_PROBE = ("import jax, jax.numpy as jnp; x = jnp.ones((128, 128)); "
          "print(float((x @ x).sum()))")


def _host_pinned() -> bool:
    """True when the caller pinned a host (non-TPU) platform, so there is
    no remote backend to wait for: either via ALINE_PLATFORM (an EMPTY
    value means "no pin" — see aline_tpu/__init__.py) or via jax.config
    directly (the test conftest does; the JAX_PLATFORMS env var is
    overridden by the host's sitecustomize so it is NOT a reliable
    signal)."""
    pin = os.environ.get("ALINE_PLATFORM")
    if pin and pin not in ("axon", "tpu"):
        return True
    jaxmod = sys.modules.get("jax")
    if jaxmod is not None:
        cfg_pin = getattr(jaxmod.config, "jax_platforms", None)
        if cfg_pin and not any(t in cfg_pin for t in ("axon", "tpu")):
            return True
    return False


def wait_for_backend(budget_s: float = 900, probe_timeout: float = 240,
                     log=None) -> bool:
    """Block until a subprocess can run a tiny matmul on the backend.

    Returns True if a probe succeeded, False if the budget ran out.
    No-op (True) when a host platform is pinned (see ``_host_pinned``);
    the probe subprocess inherits the env, so it exercises exactly the
    platform the caller will attach to.
    """
    if log is None:
        def log(*a):
            print(*a, file=sys.stderr, flush=True)
    if _host_pinned():
        return True
    deadline = time.time() + budget_s
    attempt = 0
    while True:
        try:
            subprocess.run([sys.executable, "-c", _PROBE],
                           timeout=probe_timeout, check=True,
                           stdout=subprocess.DEVNULL,
                           stderr=subprocess.DEVNULL)
            if attempt:
                log(f"[preflight] backend recovered after {attempt} retries")
            return True
        except (subprocess.TimeoutExpired,
                subprocess.CalledProcessError) as e:
            attempt += 1
            if time.time() >= deadline:
                log(f"[preflight] backend probe still failing after "
                    f"{budget_s:.0f}s ({type(e).__name__}); attempting "
                    "the real attach")
                return False
            log(f"[preflight] probe failed ({type(e).__name__}), retry "
                f"{attempt} in 30s")
            time.sleep(30)
