from .field_adapters import FQ_ADAPTER, FQ2_ADAPTER
from . import points, g1, g2

__all__ = ["FQ_ADAPTER", "FQ2_ADAPTER", "points", "g1", "g2"]
