"""Environment registry (reference ``src/envs/__init__.py``)."""
from .base import ENV_REGISTRY, register_env
from . import group_matching  # noqa: F401  (registers "group_matching")

# scenario registry for the entity-battle env (reference custom_scenarios.py);
# populated when the combat env module is imported.
from .combat.scenarios import SCENARIO_REGISTRY
from . import combat  # noqa: F401  (registers "entity_battle")
from .combat import flat_env  # noqa: F401  (registers "flat_battle")
from .combat.flat_env import MAP_REGISTRY

# reference env names resolve to the stand-in battle envs
# (src/envs/__init__.py registers "sc2custom" / "sc2")
ENV_REGISTRY.setdefault("sc2custom", ENV_REGISTRY["entity_battle"])
ENV_REGISTRY.setdefault("sc2", ENV_REGISTRY["flat_battle"])
