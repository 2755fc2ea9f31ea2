from . import numerics
from .attention import spatial_attention, flash_attention

__all__ = ["numerics", "spatial_attention", "flash_attention"]
