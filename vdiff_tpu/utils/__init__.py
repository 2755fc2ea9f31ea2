from .config import dict2str, update_config, fill_with_defaults
from .misc import seed_all, save_image, make_grid, RunningStatistics

__all__ = [
    "dict2str",
    "update_config",
    "fill_with_defaults",
    "seed_all",
    "save_image",
    "make_grid",
    "RunningStatistics",
]
