from .scheduler import DDPMGFNScheduler
from .lora import lora_init, lora_merge, lora_targets_default
from .samplers import PosteriorPriorDGFN
from .replay_buffer import ReplayBuffer

__all__ = ["DDPMGFNScheduler", "lora_init", "lora_merge", "lora_targets_default", "PosteriorPriorDGFN", "ReplayBuffer"]
