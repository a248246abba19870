from .hashing import MINHASH_PRIME, md5_long, md5_long_sql, minhash_coeffs
from .skew import explode_salts, salted_join, with_salt
from .windows import avg_rank, rolling_avg, rolling_avg_exact

__all__ = [
    "MINHASH_PRIME",
    "avg_rank",
    "explode_salts",
    "md5_long",
    "md5_long_sql",
    "minhash_coeffs",
    "rolling_avg",
    "rolling_avg_exact",
    "salted_join",
    "with_salt",
]
