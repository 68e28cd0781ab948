from .scheduler import DDPMGFNScheduler
from .schedulers_extra import DDIMGFNScheduler, DDPMDPScheduler, EDMEulerGFNScheduler, SDEVEGFNScheduler
from .lora import lora_init, lora_merge, lora_targets_default
from .samplers import PosteriorPriorDGFN, PosteriorPriorBaselineSampler
from .replay_buffer import ReplayBuffer
from .denoisers import UNet2D, UNet3DSeq, UNetSeqDenoiser
from .pipelines import (DDIMGFNPipeline, DDPMDPPipeline, DDPMGFNPipeline,
                        DiffusionPipeline, LDMGFNPipeline)

__all__ = [
    "DDPMGFNScheduler",
    "DDIMGFNScheduler",
    "DDPMDPScheduler",
    "EDMEulerGFNScheduler",
    "SDEVEGFNScheduler",
    "lora_init",
    "lora_merge",
    "lora_targets_default",
    "PosteriorPriorDGFN",
    "PosteriorPriorBaselineSampler",
    "ReplayBuffer",
    "UNet2D",
    "UNet3DSeq",
    "UNetSeqDenoiser",
]
