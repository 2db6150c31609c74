from .instancenorm import instance_norm_film

__all__ = ["instance_norm_film"]
