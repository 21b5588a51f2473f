from mapreduce_6_824_lab1_spark.functions.text import (
    TOKEN_DELIM,
    tokens_col,
    words_of,
)

__all__ = ["TOKEN_DELIM", "tokens_col", "words_of"]
