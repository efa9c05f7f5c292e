"""Config system tests: preset selection, dotted overrides, coercion."""
import pytest

from aline_tpu.config import (
    Config,
    GPTaskConfig,
    parse_overrides,
    task_preset_names,
    to_yaml,
)


def test_reference_readme_command_translates():
    # README GP-AL 1D command (reference: README.md:35)
    cfg = parse_overrides([
        "task=al_mix", "max_epoch=200000", "burning_epoch=20000",
        "task.dim_x=1", "task.n_target_theta=2", "task.n_query_init=200",
        "task.lengthscale_lower=0.1", "task.lengthscale_upper=2.0",
        "task.design_scale=5", "gamma=1", "file_name=aline_al_1d.pth",
        "checkpoint_name=ckpt_al_1d.tar", "min_T=30", "T=30",
    ])
    assert isinstance(cfg.task, GPTaskConfig)
    assert cfg.task.dim_x == 1
    assert cfg.task.n_target_theta == 2
    assert cfg.max_epoch == 200000
    assert cfg.gamma == 1.0
    assert cfg.min_T == 30 and cfg.T == 30
    assert cfg.task.embedding_type == "mix"
    assert cfg.task.mask_type == ["split"]


def test_eval_preset_and_override():
    cfg = parse_overrides(["eval=bed", "eval.L_final=1000000",
                           "eval.batch_size_final=200"])
    assert cfg.eval.EIG is True
    assert cfg.eval.L_final == 1_000_000
    assert cfg.eval.batch_size_final == 200


def test_min_T_clamped_to_T():
    cfg = parse_overrides(["T=10"])  # default min_T=30 > 10
    assert cfg.min_T == 10


def test_list_and_none_coercion():
    cfg = parse_overrides(["task=psychometric",
                           "task.mask_type=[predefined]",
                           "task.n_selected_targets=null"])
    assert cfg.task.mask_type == ["predefined"]
    assert cfg.task.n_selected_targets is None


def test_bool_coercion():
    cfg = parse_overrides(["time_token=True", "clip_grads=false"])
    assert cfg.time_token is True
    assert cfg.clip_grads is False


def test_unknown_key_raises():
    with pytest.raises(KeyError):
        parse_overrides(["task.nonexistent_field=3"])
    with pytest.raises(KeyError):
        parse_overrides(["task=not_a_task"])


def test_presets_cover_reference_tasks():
    names = task_preset_names()
    for expected in ("al_data", "al_mix", "al_theta", "ces", "hpo",
                     "location_finding", "psychometric"):
        assert expected in names


def test_to_yaml_roundtrippable():
    s = to_yaml(Config())
    assert '"dim_embedding": 32' in s


def test_nested_list_json_booleans():
    """JSON-spelled nested mask lists parse (round-3 fix: lowercase
    true/false/null inside list literals previously hit the naive
    comma-split fallback and came back as mangled strings)."""
    cfg = parse_overrides([
        "task=psychometric",
        "task.predefined_masks=[[false,false,true,true],"
        "[true,true,false,false],[true,true,true,true]]",
        "task.predefined_mask_weights=[1,1,1]"])
    assert cfg.task.predefined_masks == [
        [False, False, True, True],
        [True, True, False, False],
        [True, True, True, True]]
    assert cfg.task.predefined_mask_weights == [1, 1, 1]
