from .text import DUCK_TOKS_EXPR, SPARK_TOKS_EXPR, TOKEN_SPLIT_RE, tokens_col
from .vectors import l2sq_col

__all__ = [
    "DUCK_TOKS_EXPR",
    "SPARK_TOKS_EXPR",
    "TOKEN_SPLIT_RE",
    "tokens_col",
    "l2sq_col",
]
