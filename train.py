#!/usr/bin/env python
"""Training entry point.

CLI parity with the reference (reference: train_aline.py:184-283) via
hydra-style overrides, e.g. the README GP-AL 1D recipe
(reference: README.md:35):

    python train.py task=al_mix max_epoch=200000 burning_epoch=20000 \
        task.dim_x=1 task.n_target_theta=2 task.n_query_init=200 \
        task.lengthscale_lower=0.1 task.lengthscale_upper=2.0 \
        task.design_scale=5 gamma=1 file_name=aline_al_1d.pth \
        checkpoint_name=ckpt_al_1d.tar min_T=30 T=30
"""
from __future__ import annotations

import os
import sys

import jax


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    from aline_tpu.config import parse_overrides, to_yaml
    from aline_tpu.utils.preflight import wait_for_backend
    wait_for_backend()
    cfg = parse_overrides(argv)
    if cfg.debug_nans:
        jax.config.update("jax_debug_nans", True)

    os.makedirs(cfg.output_dir, exist_ok=True)

    from aline_tpu.utils.logging import create_logger
    from aline_tpu.utils.serialization import save_config
    logger = create_logger(os.path.join(cfg.output_dir, "logs"),
                           name=cfg.task.name or "aline")
    logger.info("Running with config:\n%s", to_yaml(cfg))
    logger.info("JAX devices: %s", jax.devices())
    save_config(cfg, cfg.output_dir)

    from aline_tpu.train.loop import Trainer
    trainer = Trainer(cfg, logger=logger)
    logger.info("Task: %s", trainer.task)

    # periodic in-training EIG eval (reference: train_aline.py:163-169)
    eval_hook = None
    if cfg.eval.EIG:
        from aline_tpu.eval.eig import eval_boed

        def eval_hook(tr, epoch):
            T_eval = cfg.T - cfg.task.n_context_init
            # key derives from the run seed so different runs evaluate
            # on independent batches (same-epoch comparability within a
            # run is preserved via fold_in by epoch)
            k_eval = jax.random.fold_in(jax.random.key(cfg.seed ^ 0xE7A1),
                                        epoch)
            b = eval_boed(tr.model, tr.params, tr.task, T_eval,
                          cfg.eval.L, cfg.eval.M, cfg.eval.batch_size,
                          k_eval, cfg.time_token,
                          stepwise=False, L_chunk=cfg.eval.L_chunk)
            return {"pce_mean": float(b["pce_mean"]),
                    "nmc_mean": float(b["nmc_mean"])}

    from aline_tpu.config import to_dict
    from aline_tpu.utils.tracking import RunTracker
    tracker = RunTracker(cfg.output_dir, config=to_dict(cfg))
    trainer.train(eval_hook=eval_hook, tracker=tracker)
    tracker.finish()

    # final save (reference: train_aline.py:259)
    from aline_tpu.train.checkpoint import save_checkpoint
    final = os.path.join(cfg.output_dir, "model",
                         cfg.file_name.split(".")[0])
    save_checkpoint(final, dict(params=trainer.params))
    logger.info("Model has been saved at %s", final)

    # final EIG evaluation (reference: train_aline.py:262-276)
    if cfg.eval.EIG:
        from aline_tpu.eval.eig import eval_boed
        import numpy as np
        T_final = cfg.eval.T_final - cfg.task.n_context_init
        bounds = eval_boed(
            trainer.model, trainer.params, trainer.task, T_final,
            cfg.eval.L_final, cfg.eval.M_final, cfg.eval.batch_size_final,
            jax.random.key(cfg.seed + 1), cfg.time_token, stepwise=True,
            L_chunk=cfg.eval.L_chunk, n_query=cfg.eval.n_query_final,
            logger=logger)
        logger.info("Final bounds: %s", bounds)
        t_idx = min(cfg.T - 1, len(bounds["pce_mean"]) - 1)
        logger.info(
            "PCE: %.3f+-%.3f\tNMC: %.3f+-%.3f",
            bounds["pce_mean"][t_idx], bounds["pce_err"][t_idx],
            bounds["nmc_mean"][t_idx], bounds["nmc_err"][t_idx])
        eval_dir = os.path.join(cfg.output_dir, "eval")
        os.makedirs(eval_dir, exist_ok=True)
        out = os.path.join(
            eval_dir, f"{cfg.file_name.split('.')[0]}"
            f"_N{cfg.eval.n_query_final}_T{cfg.eval.T_final}.npz")
        np.savez(out, **bounds)
        logger.info("Bounds have been saved at %s.", out)


if __name__ == "__main__":
    main()
