"""Training loop: jitted scan-rollout steps, burning-phase schedule,
periodic logging / EIG eval / checkpointing.

Orchestration parity with the reference ``train`` entry point
(reference: train_aline.py:21-181), redesigned so that everything between
"sample a batch" and "apply the optimizer update" is ONE compiled XLA
program per (phase, T, pool-size) signature — no host round-trips inside
the rollout.
"""
from __future__ import annotations

import os
import random as pyrandom
import time
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from aline_tpu.config import Config
from aline_tpu.models.aline import build_model
from aline_tpu.ops.target_mask import create_target_mask, target_weight_vectors
from aline_tpu.parallel.mesh import get_mesh, shard_leading_axis
from aline_tpu.tasks import HPOTask, build_task
from aline_tpu.tasks.base import init_ctx_idx
from aline_tpu.train.checkpoint import load_checkpoint, save_checkpoint
from aline_tpu.train.loss import total_loss
from aline_tpu.train.optimizer import build_optimizer, phase_for_epoch
from aline_tpu.train.rollout import rollout
from aline_tpu.utils.logging import create_logger
from aline_tpu.utils.metrics import Metrics, PhaseTimer


class Trainer:
    """Owns model/task/optimizer state and runs the epoch loop."""

    def __init__(self, cfg: Config, logger=None, task=None, model=None):
        self.cfg = cfg
        self.logger = logger or create_logger(
            os.path.join(cfg.output_dir, "logs"), name=cfg.task.name or "aline")
        self.task = task if task is not None else build_task(cfg.task)
        self.model = model if model is not None else build_model(cfg)
        self.metrics = Metrics()
        self.timer = PhaseTimer()

        self.pyrng = pyrandom.Random(cfg.seed if cfg.fix_seed else None)
        self.nprng = np.random.default_rng(cfg.seed if cfg.fix_seed else None)
        self.key = jax.random.key(cfg.seed)

        # Data-parallel mesh (1-device when batch doesn't divide).
        n_dev = len(jax.devices())
        want = cfg.mesh_data if cfg.mesh_data > 0 else n_dev
        if cfg.batch_size % want != 0:
            self.logger.warning(
                f"batch_size {cfg.batch_size} not divisible by {want} "
                f"devices; training on a single device")
            want = 1
        self.mesh = get_mesh(want)

        self._step_cache: Dict[Tuple, callable] = {}
        self._sample_cache: Dict[Tuple, callable] = {}
        self._sel_variants: set = set()   # distinct static mask variants seen
        self._sel_disabled = not cfg.static_mask_keys
        self._tx = None
        self._phase = None

        # initialize params with a throwaway tiny batch
        init_batch = self._sample_batch(jax.random.key(0), 2,
                                        min(4, cfg.task.n_query_init))
        self.params = self.model.init(jax.random.key(cfg.seed), init_batch,
                                      training=False)
        self.opt_state = None
        self.start_epoch = 0

    # -- plumbing ----------------------------------------------------------
    def _sample_batch(self, key, batch_size: int, n_query: int):
        if isinstance(self.task, HPOTask):
            return self.task.sample_batch(self.nprng, batch_size, n_query)
        sig = (batch_size, n_query)
        if sig not in self._sample_cache:
            # fold a constant inside jit so the batch key decorrelates from
            # the step key without an extra host-side dispatch (tiny host
            # ops are expensive over remote-device transports)
            def _sample(k, task=self.task, bs=batch_size, nq=n_query):
                return task.sample_batch(jax.random.fold_in(k, 0x5A17),
                                         bs, nq)
            self._sample_cache[sig] = jax.jit(_sample)
        return self._sample_cache[sig](key)

    def _ensure_phase(self, phase: str):
        if phase != self._phase:
            self._tx, self._sched = build_optimizer(self.cfg, self.params,
                                                    phase)
            self.opt_state = self._tx.init(self.params)
            self._phase = phase
            self._step_cache.clear()

    def _static_sel(self, mask) -> Optional[Tuple[int, ...]]:
        """Static key-set variant for this epoch's target mask, or None.

        Tasks with a small mask universe (all / split / predefined) get
        one compiled step per variant with the never-visible target key
        columns sliced out of the compact attention (exact — see
        ops/attention.py CompactKeys.ext_idx). Auto-disables for tasks
        that keep producing fresh masks (random n_selected_targets)."""
        if self._sel_disabled or self.cfg.encoder.attention_impl not in (
                "auto", "compact"):
            return None
        sel = tuple(int(i) for i in np.flatnonzero(np.asarray(mask)))
        if len(sel) == len(mask):
            return None        # nothing to slice; share the generic step
        self._sel_variants.add(sel)
        if len(self._sel_variants) > self.cfg.static_mask_keys_max:
            self._sel_disabled = True
            self.logger.info(
                "static_mask_keys: >%d distinct masks; falling back to "
                "the generic step" % self.cfg.static_mask_keys_max)
            return None
        return sel

    def _get_step(self, T: int, sel: Optional[Tuple[int, ...]] = None):
        sig = (self._phase, T, sel)
        if sig in self._step_cache:
            return self._step_cache[sig]
        cfg, model, tx = self.cfg, self.model, self._tx

        def step(params, opt_state, key, batch, w_q, w_p, alpha_design):
            k_roll, k_next = jax.random.split(key)

            def loss_fn(p):
                ro = rollout(model, p, batch, T, w_q, w_p, k_roll,
                             training=True, time_token=cfg.time_token,
                             time_forward=True,
                             use_remat=cfg.rollout_remat,
                             remat_policy=cfg.remat_policy,
                             unroll=cfg.rollout_unroll,
                             sel_targets=sel)
                return total_loss(ro, cfg.gamma, alpha_design)

            (loss, m), grads = jax.value_and_grad(loss_fn,
                                                  has_aux=True)(params)
            # observability: global grad/param norms ride along as two
            # device-side scalars (the wandb.watch equivalent; reference:
            # train_aline.py:252-253) — saturation/explosion shows up in
            # metrics.jsonl without any extra sync
            m["grad_norm"] = optax.global_norm(grads)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            m["param_norm"] = optax.global_norm(params)
            return params, opt_state, k_next, m

        fn = jax.jit(step, donate_argnums=(0, 1))
        self._step_cache[sig] = fn
        return fn

    # -- checkpointing -----------------------------------------------------
    def _ckpt_dir(self, with_epoch: Optional[int] = None) -> str:
        name = self.cfg.checkpoint_name.split(".")[0]
        if with_epoch is not None:
            name = f"{name}_{with_epoch}"
        return os.path.join(self.cfg.output_dir, name)

    def save(self, epoch: int, with_epoch: bool = False):
        device_state = dict(params=self.params, opt_state=self.opt_state,
                            key=jax.random.key_data(self.key))
        host_state = dict(epoch=epoch, phase=self._phase,
                          pyrandom=self.pyrng.getstate(),
                          numpy=self.nprng.bit_generator.state)
        path = self._ckpt_dir(epoch if with_epoch else None)
        save_checkpoint(path, device_state, host_state)
        return path

    def restore(self, path: Optional[str] = None):
        """Resume: restores params/optimizer/PRNG and the host RNG streams
        (reference: utils/misc.py:93-135 incl. the layerwise-optimizer
        rebuild for the resumed phase at :117-118)."""
        import pickle
        path = path or self._ckpt_dir()
        # read host state first: the phase determines the opt_state layout
        # that the device-tree template must be built with
        with open(os.path.join(os.path.abspath(path), "host_state.pkl"),
                  "rb") as f:
            host = pickle.load(f)
        self._ensure_phase(host["phase"])
        template = dict(params=self.params, opt_state=self.opt_state,
                        key=jax.random.key_data(self.key))
        device_state, _ = load_checkpoint(path, template)
        self.params = device_state["params"]
        self.opt_state = device_state["opt_state"]
        self.key = jax.random.wrap_key_data(device_state["key"])
        if self.mesh.devices.size > 1:
            # orbax restores COMMITTED single-device arrays; replicate them
            # over the data mesh or the jitted step rejects the mixed
            # placement (uncommitted init params replicate implicitly)
            from jax.sharding import NamedSharding, PartitionSpec
            rep = NamedSharding(self.mesh, PartitionSpec())
            self.params = jax.device_put(self.params, rep)
            self.opt_state = jax.device_put(self.opt_state, rep)
            self.key = jax.device_put(self.key, rep)
        self.start_epoch = host["epoch"]
        self.pyrng.setstate(host["pyrandom"])
        self.nprng.bit_generator.state = host["numpy"]
        self.logger.info(f"Restored checkpoint from {path} at epoch "
                         f"{self.start_epoch}")

    # -- training ----------------------------------------------------------
    def _epoch_mask_and_weights(self):
        tc = self.cfg.task
        mask_type = self.pyrng.choice(list(tc.mask_type))
        mask = create_target_mask(
            mask_type, tc.embedding_type, self.task.n_target_data,
            self.task.n_target_theta, tc.n_selected_targets,
            tc.predefined_masks, tc.predefined_mask_weights, tc.mask_index,
            tc.attend_to, rng=self.pyrng)
        w_q, w_p = target_weight_vectors(
            mask, tc.embedding_type, mask_type, self.task.n_target_data,
            self.task.n_target_theta)
        return mask, w_q, w_p

    def train_epoch(self, epoch: int) -> Dict[str, float]:
        cfg = self.cfg
        phase = phase_for_epoch(cfg, epoch)
        if phase != self._phase:
            if self._phase == "burning":
                # burning→main boundary: snapshot + optimizer rebuild
                # (reference: train_aline.py:141-149)
                p = os.path.join(cfg.output_dir, "model",
                                 f"{cfg.file_name.split('.')[0]}_burning")
                save_checkpoint(p, dict(params=self.params))
                self.logger.info(f"Burning snapshot saved at {p}")
            self._ensure_phase(phase)

        T = self.pyrng.randint(cfg.min_T, cfg.T)
        # burning shrinks the query pool to T (reference :47-48,146)
        n_query = cfg.T if phase == "burning" else cfg.task.n_query_init

        with self.timer.phase("sample"):
            # the step key self.key is split device-side inside the jitted
            # step; the batch key is derived from it inside the jitted
            # sampler — zero host-side PRNG dispatches per epoch
            batch = self._sample_batch(self.key, cfg.batch_size, n_query)
            mask, w_q, w_p = self._epoch_mask_and_weights()
            batch = batch.replace(target_mask=jnp.asarray(mask))
            # static context bound + index buffer → compact-key attention
            batch = init_ctx_idx(
                batch, min(self.task.n_context_init + T, batch.n_points))
            if self.mesh.devices.size > 1:
                batch = shard_leading_axis(batch, self.mesh)

        alpha_design = jnp.asarray(
            0.0 if phase == "burning" else cfg.alpha, jnp.float32)
        step_fn = self._get_step(T, self._static_sel(mask))
        with self.timer.phase("step"):
            self.params, self.opt_state, self.key, m = step_fn(
                self.params, self.opt_state, self.key, batch,
                jnp.asarray(w_q), jnp.asarray(w_p), alpha_design)
        # metrics stay device-side; callers convert lazily (a float() here
        # would force a sync every epoch and stall the dispatch pipeline)
        m["T"] = T
        return m

    def train(self, eval_hook=None, tracker=None):
        """Full training run (reference: train_aline.py:53-181).

        Args:
            eval_hook: optional callable(trainer, epoch) → dict run every
                ``verbose`` epochs when cfg.eval.EIG (PCE/NMC bounds).
            tracker: optional RunTracker for metric series.
        """
        cfg = self.cfg
        self._ensure_phase(phase_for_epoch(cfg, self.start_epoch))
        if cfg.load_checkpoint:
            ckpt = cfg.load_path or self._ckpt_dir()
            if os.path.exists(os.path.join(os.path.abspath(ckpt),
                                           "host_state.pkl")):
                self.restore(cfg.load_path)
            else:
                # resume-if-present semantics: a fresh output dir starts from
                # scratch instead of crashing, so idempotent relaunch wrappers
                # can always pass load_checkpoint=true
                self.logger.info(f"No checkpoint at {ckpt}; starting fresh")

        # NOTE: epochs dispatch asynchronously; per-epoch wall times are
        # only meaningful at the verbose sync points, so report the overall
        # wall-clock rate (total / n) rather than per-dispatch times.
        wall_start = time.perf_counter()
        epoch_times = []
        profiling = False
        for epoch in range(self.start_epoch, cfg.max_epoch):
            if cfg.profile_dir is not None:
                # profile a few steady-state epochs after compilation
                if epoch == self.start_epoch + 2 and not profiling:
                    jax.profiler.start_trace(cfg.profile_dir)
                    profiling = True
                elif profiling and epoch == self.start_epoch + 2 + \
                        cfg.profile_epochs:
                    jax.effects_barrier()
                    jax.profiler.stop_trace()
                    profiling = False
                    self.logger.info(
                        f"Profiler trace written to {cfg.profile_dir}")
            t0 = time.perf_counter()
            m = self.train_epoch(epoch)
            epoch_times.append(time.perf_counter() - t0)

            if epoch % cfg.verbose == 0:
                m = {k: float(v) for k, v in m.items()}  # sync point
                self.metrics.log(**m)
                if tracker is not None:
                    tracker.log(m, step=epoch)
                self.logger.info(
                    f"Epoch: {epoch}, loss: {m['loss']:.4f}, T: {m['T']}, "
                    f"likelihood: {m['likelihood']:.4f}, design_loss: "
                    f"{m['design_loss']:.4f}, predict_loss: "
                    f"{m['predict_loss']:.4f}")
                if cfg.eval.EIG and eval_hook is not None:
                    bounds = eval_hook(self, epoch)
                    if tracker is not None:
                        tracker.log({k: v for k, v in bounds.items()
                                     if isinstance(v, (int, float))},
                                    step=epoch)
                    self.logger.info(
                        f"PCE: {bounds.get('pce_mean')}\t"
                        f"NMC: {bounds.get('nmc_mean')}")

            next_epoch = epoch + 1
            if cfg.checkpoint and next_epoch % cfg.checkpoint == 0:
                self.save(next_epoch)

        if profiling:
            jax.effects_barrier()
            jax.profiler.stop_trace()
        if epoch_times:
            _ = {k: float(v) for k, v in m.items()}  # final sync
        total = time.perf_counter() - wall_start
        n = max(len(epoch_times), 1)
        self.logger.info(
            f"Total training time: {total:.2f}s ({total/3600:.2f}h), "
            f"average wall time per epoch: {total/n:.4f}s")
        return epoch_times
