from .text import TOKEN_SPLIT_RE, tokens_col
from .vectors import l2sq_col

__all__ = ["TOKEN_SPLIT_RE", "tokens_col", "l2sq_col"]
