"""L5 metrics subsystem: FID (streaming Inception statistics + Fréchet
distance) and improved Precision/Recall. See fid.py, inception.py,
precision_recall.py."""

from .fid import InceptionStatistics, get_precomputed, calc_fd

__all__ = ["InceptionStatistics", "get_precomputed", "calc_fd"]
