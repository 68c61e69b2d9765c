from .namespace import dict2namespace, namespace2dict
from .rng import RngStream

__all__ = ["dict2namespace", "namespace2dict", "RngStream"]
