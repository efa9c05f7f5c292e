"""Composable dataclass configuration with hydra-style CLI overrides.

Mirrors the reference's hydra group layout (reference: config/train.yaml,
config/{task,encoder,embedder,head,eval}/*.yaml) with the same field names
and defaults, so that reference training commands translate 1:1, e.g.::

    python train.py task=al_mix task.dim_x=1 task.n_target_theta=2 \
        max_epoch=200000 burning_epoch=20000 gamma=1 min_T=30 T=30

Group selection (``task=al_mix``, ``eval=bed``) swaps in a registered preset;
dotted assignments (``task.dim_x=1``) override single fields with type
coercion based on the dataclass field type.
"""
from __future__ import annotations

import ast
import copy
import dataclasses
import json
import re
from dataclasses import dataclass, field
from typing import Any, List, Optional, Sequence, Tuple


# --------------------------------------------------------------------------
# Model groups
# --------------------------------------------------------------------------

@dataclass
class EncoderConfig:
    """Transformer encoder (reference: config/encoder/encoder.yaml)."""
    dim_embedding: int = 32
    dim_feedforward: int = 128
    n_head: int = 4
    dropout: float = 0.0
    num_layers: int = 3
    # TPU-specific: which attention implementation to use.
    #   "naive"   – jnp dot-product attention with an explicit [B,N,N] bias
    #   "compact" – gather keys into the ~(n_ctx+T+targets)-column compact
    #               set implied by the ALINE mask (exact; the production
    #               path — wins 2-6x over flash/dense at BOTH the train
    #               B=200/N=403 and eval B=100/N=2003 operating points,
    #               f32 and bf16; see docs/PERFORMANCE.md round-2 table)
    #   "flash"   – Pallas role-masked flash-attention kernel (no [B,N,N]
    #               HBM tensor; the general-mask fallback for geometries
    #               where no compact key structure exists)
    #   "auto"    – compact whenever the batch carries a context plan
    #               (all ALINE configs), else naive
    attention_impl: str = "auto"
    # Optional global time token prepended to the sequence
    # (reference: model/encoder.py:144-223 EncoderWithTime; not wired into
    #  any reference config, provided as a capability).
    with_time_token: bool = False
    # Compute dtype ("float32" | "bfloat16"); params stay float32, score
    # softmaxes and head outputs are always float32.
    dtype: str = "float32"


@dataclass
class HeadConfig:
    """Output head (reference: config/head/head.yaml)."""
    num_components: int = 10
    single_head: bool = False
    std_min: float = 1e-4
    value_head: bool = False
    # Continuous (DAD-style) Gaussian design policy instead of discrete
    # candidate selection (reference: model/head.py:396-495).
    continuous: bool = False
    # Clip range for the continuous policy's log-std (reference hardcodes
    # [-20, 2] at model/head.py:471-472, which lets the exploration std
    # collapse to ~0 or saturate at e^2=7.4; a bounded range such as
    # [log 0.05, log 1] keeps REINFORCE + pathwise training stable).
    policy_log_std_min: float = -20.0
    policy_log_std_max: float = 2.0
    # Fused Pallas GMM-head kernel: "auto" (TPU only) | "on" | "off".
    fused_gmm: str = "auto"


@dataclass
class EmbedderConfig:
    """Embedder (reference: config/embedder/embedder.yaml).

    dim_x / dim_y / embedding_type / n_target_theta are interpolated from the
    task config at build time, and dim_embedding / dim_feedforward from the
    encoder config, exactly like the reference's hydra interpolations.
    """
    continuous: bool = False  # ContinuousEmbedder variant


# --------------------------------------------------------------------------
# Eval group
# --------------------------------------------------------------------------

@dataclass
class EvalConfig:
    """EIG evaluation (reference: config/eval/{default,bed}.yaml)."""
    EIG: bool = False
    # During training
    L: int = 50_000
    M: int = 2_000
    batch_size: int = 500
    # Final evaluation
    L_final: int = 10_000_000
    M_final: int = 2_000
    batch_size_final: int = 5
    n_query_final: int = 2_000
    T_final: int = 30
    # TPU chunking of the contrastive axis (per-device L chunk size).
    L_chunk: int = 32_768
    err_type: str = "se"


EVAL_PRESETS = {
    "default": EvalConfig(),
    "bed": EvalConfig(EIG=True),
}


# --------------------------------------------------------------------------
# Task group
# --------------------------------------------------------------------------

@dataclass
class TaskConfig:
    """Base task config; field names follow reference config/task/*.yaml."""
    target: str = ""              # registry key of the task class
    name: str = ""
    dim_x: int = 1
    dim_y: int = 1

    embedding_type: str = "data"  # "data" | "theta" | "mix"
    mask_type: List[str] = field(default_factory=lambda: ["all"])
    n_selected_targets: Optional[int] = None
    predefined_masks: Optional[List[List[bool]]] = None
    predefined_mask_weights: Optional[List[float]] = None
    mask_index: Optional[int] = None
    attend_to: Optional[str] = None

    n_context_init: int = 1
    n_query_init: int = 200
    n_target_data: int = 0
    n_target_theta: int = 0

    design_scale: float = 5.0
    noise_scale: float = 0.01


@dataclass
class GPTaskConfig(TaskConfig):
    """GP active-learning task (reference: config/task/al_*.yaml,
    tasks/gaussian_process.py:29-81)."""
    target: str = "gp"
    p_iso: float = 0.5
    kernel_weights: Optional[List[float]] = None   # defaults to [1/3,0,1/3,1/3]
    lengthscale_lower: float = 0.1
    lengthscale_upper: float = 2.0
    # Design-point generator: "uniform" (reference default, :108-120),
    # "sobol" (scrambled Sobol, reference :123-165, pure-JAX), or
    # "lattice" (randomized rank-1 Kronecker lattice).
    data_gen: str = "uniform"


@dataclass
class LocationFindingConfig(TaskConfig):
    """Hidden-source location finding (reference:
    config/task/location_finding.yaml, tasks/location_finding.py:11-82)."""
    target: str = "location_finding"
    K: int = 1
    theta_dist: str = "uniform"
    outcome_scale: float = 10.0
    base_signal: float = 0.1
    max_signal: float = 1e-4


@dataclass
class CESTaskConfig(TaskConfig):
    """CES utility experiment (reference: config/task/ces.yaml,
    tasks/ces.py:12-49)."""
    target: str = "ces"
    epsilon: float = 2.0 ** (-22)
    # Censored-tail asymptote: "log_ndtr" (exact, default) or "reference"
    # (bit-compatible with the reference's hand-rolled branch, for
    # cross-framework parity runs).
    tail_mode: str = "log_ndtr"


@dataclass
class PsychometricConfig(TaskConfig):
    """Psychometric function task (reference: config/task/psychometric.yaml,
    tasks/psychometric.py:11-67)."""
    target: str = "psychometric"


@dataclass
class BenchmarkTaskConfig(TaskConfig):
    """Analytic benchmark functions, eval-only (reference:
    tasks/al_benchmarks.py:10-84)."""
    target: str = "benchmark"
    benchmark_name: str = "forrester"


@dataclass
class HPOTaskConfig(TaskConfig):
    """HPO-B lookup task (reference: config/task/hpo.yaml,
    tasks/hpo.py:252-322)."""
    target: str = "hpo"
    meta_dataset: str = "ranger"
    min_n_context: int = 5
    max_n_context: int = 10
    normalize_y: bool = False
    data_path: Optional[str] = None


def _task_presets():
    """Task presets mirroring reference config/task/*.yaml values."""
    return {
        "al_data": GPTaskConfig(
            name="AL_data", dim_x=1, embedding_type="data",
            mask_type=["all"], n_context_init=1, n_query_init=200,
            n_target_data=100, n_target_theta=0,
            design_scale=5.0, noise_scale=0.01),
        "al_mix": GPTaskConfig(
            name="AL_mix", dim_x=2, embedding_type="mix",
            mask_type=["split"], n_context_init=1, n_query_init=200,
            n_target_data=100, n_target_theta=3,
            design_scale=5.0, noise_scale=0.01),
        "al_theta": GPTaskConfig(
            name="AL_theta", dim_x=1, embedding_type="theta",
            mask_type=["all"], n_context_init=1, n_query_init=200,
            n_target_data=0, n_target_theta=2,
            design_scale=5.0, noise_scale=0.01),
        "ces": CESTaskConfig(
            name="CES", dim_x=6, embedding_type="theta",
            mask_type=["all"], n_context_init=1, n_query_init=200,
            n_target_data=0, n_target_theta=5,
            design_scale=100.0, noise_scale=0.005),
        "location_finding": LocationFindingConfig(
            name="Location", dim_x=2, embedding_type="theta",
            mask_type=["all"], n_context_init=1, n_query_init=200,
            n_target_data=0, n_target_theta=2, K=1,
            theta_dist="uniform", design_scale=1.0, outcome_scale=10.0,
            noise_scale=0.5, base_signal=0.1, max_signal=1e-4),
        "psychometric": PsychometricConfig(
            name="Psychometric", dim_x=1, embedding_type="theta",
            mask_type=["predefined"],
            predefined_masks=[[False, False, True, True],
                              [True, True, False, False]],
            predefined_mask_weights=[1.0, 1.0],
            n_context_init=1, n_query_init=200,
            n_target_data=0, n_target_theta=4, design_scale=5.0),
        "hpo": HPOTaskConfig(
            name="HPO", dim_x=9, embedding_type="data",
            mask_type=["all"], n_context_init=5, n_query_init=100,
            n_target_data=100, n_target_theta=0,
            meta_dataset="ranger"),
        "benchmark": BenchmarkTaskConfig(
            name="Benchmark", dim_x=1, embedding_type="data",
            mask_type=["all"], n_context_init=5, n_query_init=10,
            n_target_data=5, design_scale=5.0, noise_scale=0.1),
    }


# --------------------------------------------------------------------------
# Root config
# --------------------------------------------------------------------------

@dataclass
class Config:
    """Root training config (reference: config/train.yaml)."""
    seed: int = 123
    fix_seed: bool = True

    max_epoch: int = 100_000
    burning_epoch: int = 10_000
    batch_size: int = 200

    min_T: int = 30
    T: int = 30
    time_token: bool = False

    optimizer: str = "AdamW"
    lr: float = 1e-3
    # Linear 0→lr warmup steps prepended to the cosine schedule (0 =
    # reference behavior). Use when warm-starting from trained params:
    # fresh Adam moments at full lr otherwise jolt the loaded optimum.
    lr_warmup: int = 0

    gamma: float = 1.0
    alpha: float = 1.0
    # Pathwise sPCE design objective for the continuous policy
    # (scripts/train_continuous.py): weight of the DAD-style PCE loss
    # computed on the rollout's (differentiable) designs/outcomes with
    # `pce_L` contrastive thetas. 0 disables (reference behavior: designs
    # train by REINFORCE only). Exploits what torch's detached rollouts
    # cannot: the whole scan is reparameterized, so d(sPCE)/d(designs)
    # flows end-to-end.
    alpha_pce: float = 0.0
    pce_L: int = 255
    # Exploration noise std (normalized design units) added to emitted
    # designs during pathwise sPCE training (scripts/train_dad.py) —
    # breaks the deterministic-policy symmetry trap; 0 at evaluation.
    explore_std: float = 0.0

    clip_grads: bool = True
    verbose: int = 500
    checkpoint: int = 100
    load_checkpoint: bool = False
    load_path: Optional[str] = None
    checkpoint_name: str = "ckpt.tar"

    output_dir: str = "./outputs"
    file_name: str = "aline.pth"

    # Mesh: number of data-parallel shards; 0 = use all local devices.
    mesh_data: int = 0
    # Rematerialize each rollout step's activations in the backward pass.
    # True bounds HBM to one step's activations (needed for big B*N*T);
    # False trades memory for ~no recompute (faster when it fits).
    rollout_remat: bool = True
    # remat granularity: 'full' recomputes everything in the backward pass;
    # 'dots' saves matmul outputs (jax.checkpoint_policies
    # .dots_with_no_batch_dims_saveable) and recomputes only elementwise ops
    remat_policy: str = "full"
    # lax.scan unroll factor for the T-step rollout (1 = no unrolling)
    rollout_unroll: int = 1
    # Compile a statically specialized train step per epoch-mask variant,
    # slicing never-visible target columns out of the compact attention
    # key set (numerically exact; see ops/attention.py). Pays off when
    # the mask deselects many targets (split/theta epochs drop the 100
    # data-target key columns). Auto-disables if the task produces more
    # than `static_mask_keys_max` distinct masks (e.g. random masks).
    static_mask_keys: bool = True
    static_mask_keys_max: int = 4
    # Computation dtype for the model ("float32" | "bfloat16").
    dtype: str = "float32"
    # Numerics guard: enable jax_debug_nans (the TPU equivalent of the
    # reference's NaN guards, SURVEY.md §5.2).
    debug_nans: bool = False
    # Write a jax.profiler trace of the first few post-warmup epochs here
    # (SURVEY.md §5.1: profiling as a first-class subsystem).
    profile_dir: Optional[str] = None
    profile_epochs: int = 3

    task: TaskConfig = field(default_factory=lambda: _task_presets()["al_mix"])
    encoder: EncoderConfig = field(default_factory=EncoderConfig)
    embedder: EmbedderConfig = field(default_factory=EmbedderConfig)
    head: HeadConfig = field(default_factory=HeadConfig)
    eval: EvalConfig = field(default_factory=EvalConfig)


# --------------------------------------------------------------------------
# CLI override machinery
# --------------------------------------------------------------------------

def _coerce(value_str: str, current: Any):
    """Coerce a CLI string to the type of ``current`` (the existing value)."""
    s = value_str.strip()
    if s.lower() in ("null", "none"):
        return None
    if isinstance(current, bool):
        if s.lower() in ("true", "1", "yes"):
            return True
        if s.lower() in ("false", "0", "no"):
            return False
        raise ValueError(f"cannot parse bool from {s!r}")
    if isinstance(current, int) and not isinstance(current, bool):
        return int(float(s))
    if isinstance(current, float):
        return float(s)
    if isinstance(current, (list, tuple)) or current is None:
        # Lists like [predefined] or [[False,True]] — accept python/JSON text
        # (JSON spellings true/false/null are normalized so e.g.
        # task.predefined_masks=[[false,true],[true,false]] parses).
        try:
            normalized = re.sub(
                r"\b(true|false|null)\b",
                lambda m: {"true": "True", "false": "False",
                           "null": "None"}[m.group(0)], s)
            return ast.literal_eval(normalized)
        except (ValueError, SyntaxError):
            # Bare comma-separated or single token → list of strings / string
            if s.startswith("[") and s.endswith("]"):
                inner = s[1:-1].strip()
                if not inner:
                    return []
                return [tok.strip().strip("'\"")
                        for tok in inner.split(",")]
            return s
    return s


def _set_dotted(cfg: Any, dotted: str, value_str: str) -> None:
    parts = dotted.split(".")
    obj = cfg
    for p in parts[:-1]:
        if not hasattr(obj, p):
            raise KeyError(f"unknown config group {p!r} in {dotted!r}")
        obj = getattr(obj, p)
    leaf = parts[-1]
    if not dataclasses.is_dataclass(obj) or not hasattr(obj, leaf):
        raise KeyError(f"unknown config key {dotted!r}")
    setattr(obj, leaf, _coerce(value_str, getattr(obj, leaf)))


def parse_overrides(argv: Sequence[str],
                    base: Optional[Config] = None) -> Config:
    """Build a Config from hydra-style ``key=value`` CLI overrides.

    Group selections (``task=``, ``eval=``) are applied first so subsequent
    dotted overrides land on the selected preset, matching hydra composition
    order in the reference (config/train.yaml defaults list).
    """
    cfg = copy.deepcopy(base) if base is not None else Config()
    dotted: List[Tuple[str, str]] = []
    for arg in argv:
        if "=" not in arg:
            raise ValueError(f"override {arg!r} is not of the form key=value")
        key, _, val = arg.partition("=")
        key = key.strip()
        if key == "task":
            presets = _task_presets()
            if val not in presets:
                raise KeyError(
                    f"unknown task preset {val!r}; available: {sorted(presets)}")
            cfg.task = presets[val]
        elif key == "eval":
            if val not in EVAL_PRESETS:
                raise KeyError(f"unknown eval preset {val!r}")
            cfg.eval = copy.deepcopy(EVAL_PRESETS[val])
        elif key == "encoder":
            pass  # single preset
        elif key in ("embedder", "head"):
            pass  # single presets
        else:
            dotted.append((key, val))
    for key, val in dotted:
        _set_dotted(cfg, key, val)
    # Reference semantics: ensure min_T <= T (train_aline.py:202-203).
    if cfg.min_T > cfg.T:
        cfg.min_T = cfg.T
    return cfg


def to_dict(cfg: Any) -> Any:
    if dataclasses.is_dataclass(cfg):
        return {f.name: to_dict(getattr(cfg, f.name))
                for f in dataclasses.fields(cfg)}
    if isinstance(cfg, (list, tuple)):
        return [to_dict(v) for v in cfg]
    return cfg


def to_yaml(cfg: Any) -> str:
    """Readable dump of the config (JSON with indentation; no yaml dep)."""
    return json.dumps(to_dict(cfg), indent=2, default=str)


def task_preset_names() -> List[str]:
    return sorted(_task_presets().keys())
