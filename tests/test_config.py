"""Config system: 3-layer merge, CLI overrides, sanity check, reference
env-name aliases (reference ``src/main.py:57-102``, ``src/run.py:315-326``)."""
import pytest

from refil_tpu.config import (
    ENV_CONFIG_ALIASES,
    args_sanity_check,
    config_to_args,
    load_config,
    recursive_dict_update,
)


def test_merge_order_default_env_alg():
    cfg = load_config(alg="refil", env="entity_battle")
    # env layer sets the env + schedule horizon, alg layer the algorithm
    assert cfg["env"] == "entity_battle"
    assert cfg["agent"] == "imagine_entity_attend_rnn"
    assert cfg["t_max"] == 10000000
    # default-layer key survives the merges
    assert "gamma" in cfg


def test_cli_overrides_dotted_and_typed():
    cfg = load_config(
        alg="refil",
        env="group_matching",
        overrides=["env_args.n_agents=4", "lr=0.001", "mixer=vdn",
                   "save_model=False"],
    )
    assert cfg["env_args"]["n_agents"] == 4
    assert cfg["lr"] == 0.001
    assert cfg["mixer"] == "vdn"
    assert cfg["save_model"] is False


def test_bad_override_raises():
    with pytest.raises(ValueError):
        load_config(overrides=["notakeyvalue"])


def test_sanity_check_coerces_test_nepisode():
    # below batch_size_run -> raised to it; otherwise floored to a multiple
    assert args_sanity_check(
        {"test_nepisode": 3, "batch_size_run": 8}
    )["test_nepisode"] == 8
    assert args_sanity_check(
        {"test_nepisode": 20, "batch_size_run": 8}
    )["test_nepisode"] == 16


def test_reference_env_config_aliases():
    """Reference invocations (--env-config=sc2custom / sc2) must work
    verbatim: the shipped drop-in configs carry the reference's exact key
    surface, the env name resolves in the registry to the stand-in, and the
    env constructs from those env_args (unknown SC2-binary keys tolerated)."""
    from refil_tpu.envs import ENV_REGISTRY, SCENARIO_REGISTRY

    for ref_name, ours in ENV_CONFIG_ALIASES.items():
        cfg = load_config(env=ref_name)
        assert cfg["env"] == ref_name
        assert ENV_REGISTRY[cfg["env"]] is ENV_REGISTRY[ours]

    cfg = load_config(env="sc2custom")
    assert cfg["scenario"] in SCENARIO_REGISTRY
    scenario_dict = SCENARIO_REGISTRY[cfg["scenario"]]()
    env = ENV_REGISTRY[cfg["env"]](scenario_dict=scenario_dict,
                                   **cfg["env_args"])
    assert env.episode_limit == cfg["env_args"]["episode_limit"]


def test_reference_env_config_aliases_fallback(tmp_path):
    """A custom config dir that only ships the stand-in env yamls still
    resolves reference names through ENV_CONFIG_ALIASES."""
    import os
    import shutil

    from refil_tpu.config import _CONFIG_DIR

    cfg_dir = tmp_path / "config"
    shutil.copytree(_CONFIG_DIR, cfg_dir)
    for ref_name in ENV_CONFIG_ALIASES:
        os.remove(cfg_dir / "envs" / f"{ref_name}.yaml")
    for ref_name, ours in ENV_CONFIG_ALIASES.items():
        cfg_ref = load_config(env=ref_name, config_dir=str(cfg_dir))
        cfg_ours = load_config(env=ours, config_dir=str(cfg_dir))
        assert cfg_ref == cfg_ours


def test_reference_env_registry_aliases():
    from refil_tpu.envs import ENV_REGISTRY

    assert ENV_REGISTRY["sc2custom"] is ENV_REGISTRY["entity_battle"]
    assert ENV_REGISTRY["sc2"] is ENV_REGISTRY["flat_battle"]


def test_recursive_update_is_deep():
    d = {"a": {"b": 1, "c": 2}, "x": 0}
    recursive_dict_update(d, {"a": {"b": 9}, "y": 1})
    assert d == {"a": {"b": 9, "c": 2}, "x": 0, "y": 1}


def test_args_namespace_get():
    args = config_to_args({"lr": 0.1})
    assert args.lr == 0.1
    assert args.get("missing", 7) == 7
