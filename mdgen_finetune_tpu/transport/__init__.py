from .paths import GVPPath, LinearPath, VPPath, get_path
from .transport import Transport, create_transport, t_to_alpha
from .samplers import sample_ode, sample_sde

__all__ = [
    "GVPPath",
    "LinearPath",
    "VPPath",
    "get_path",
    "Transport",
    "create_transport",
    "t_to_alpha",
    "sample_ode",
    "sample_sde",
]
