from .env import EntityBattle
from .scenarios import SCENARIO_REGISTRY
