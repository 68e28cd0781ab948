from .denoiser import LatentMDGen

__all__ = ["LatentMDGen"]
