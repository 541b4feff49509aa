import jax.numpy as jnp
import numpy as np
import pytest

from rift_tpu.policies import CBV_POLICY_LIST, EGO_POLICY_LIST
from rift_tpu.utils.config import apply_overrides, load_config, merge


def test_registries_match_reference_keys():
    # reference keys (cbv/planning/__init__.py:22-34) plus "bc_pluto", our
    # bootstrap-pretrain stand-in for the unshipped pluto_1M_aux_cil.ckpt
    assert set(CBV_POLICY_LIST) == {
        "standard", "ppo", "frea", "fppo_rs", "pluto", "sft_pluto",
        "rtr_pluto", "rs_pluto", "reinforce_pluto", "ppo_pluto",
        "grpo_pluto", "rift_pluto", "bc_pluto",
    }
    assert set(EGO_POLICY_LIST) == {
        "behavior", "ppo", "expert", "plant", "expert_disturb", "pdm_lite",
        "vad", "uniad", "sparsedrive",
    }


def test_config_loading_and_overrides():
    cfg = load_config("rift_pluto")
    assert cfg["policy"] == "rift_pluto"
    assert cfg["train"]["epochs"] == 16
    cfg2 = apply_overrides(cfg, ["train.lr=2e-4", "+output_dir=/tmp/x"])
    assert cfg2["train"]["lr"] == 2e-4
    assert cfg2["output_dir"] == "/tmp/x"
    assert cfg["train"]["lr"] == 1e-4  # original untouched
    m = merge({"a": {"b": 1, "c": 2}}, {"a": {"b": 9}})
    assert m == {"a": {"b": 9, "c": 2}}


def test_e2e_registry_instantiates():
    # the former stubs are real policies now (tests/test_e2e_agent.py)
    for key in ("vad", "uniad", "sparsedrive"):
        ego = EGO_POLICY_LIST[key](None, {})
        assert ego.name == key and ego.type == "il"


def test_cli_eval_standard_mode(tmp_path):
    from rift_tpu.run import main

    g = main(
        [
            "--mode", "eval", "--ego_cfg", "pdm_lite", "--cbv_cfg", "standard",
            "--num_scenario", "2", "--num_agents", "6", "--num_episodes", "1",
            "--max_ticks", "60", "--town", "straight",
            "--out_dir", str(tmp_path),
        ]
    )
    assert g.total_routes == 2
    assert g.avg_route_completion > 0


def test_cli_eval_does_not_resume_unasked(tmp_path):
    """A second run over the same out_dir must NOT append to stale records
    (reference gates resume on the explicit flag, carla_runner.py:513-527)."""
    from rift_tpu.run import main

    args = [
        "--mode", "eval", "--ego_cfg", "pdm_lite", "--cbv_cfg", "standard",
        "--num_scenario", "1", "--num_agents", "6", "--num_episodes", "1",
        "--max_ticks", "30", "--town", "straight", "--out_dir", str(tmp_path),
    ]
    g1 = main(args)
    g2 = main(args)
    assert g1.total_routes == 1
    assert g2.total_routes == 1


def test_cli_train_cbv_classic_ppo(tmp_path):
    from rift_tpu.run import main

    g = main(
        [
            "--mode", "eval", "--ego_cfg", "behavior", "--cbv_cfg", "ppo",
            "--num_scenario", "1", "--num_agents", "6", "--num_episodes", "1",
            "--max_ticks", "40", "--town", "straight",
            "--out_dir", str(tmp_path),
        ]
    )
    assert g.total_routes == 1
