from .windows import avg_rank, rolling_avg
from .hashing import md5_long

__all__ = ["avg_rank", "rolling_avg", "md5_long"]
