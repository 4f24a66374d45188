"""Environment registry (reference ``src/envs/__init__.py``)."""
from .base import ENV_REGISTRY, register_env
from . import group_matching  # noqa: F401  (registers "group_matching")

# scenario registry for the entity-battle env (reference custom_scenarios.py);
# populated when the combat env module is imported.
from .combat.scenarios import SCENARIO_REGISTRY
from . import combat  # noqa: F401  (registers "entity_battle")
from .combat import flat_env  # noqa: F401  (registers "flat_battle")
from .combat.flat_env import MAP_REGISTRY
