from .agents import AGENT_REGISTRY
from .mixers import MIXER_REGISTRY
