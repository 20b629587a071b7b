from irio2024_mapreduce_spark.functions.text import (
    TOKEN_SPLIT_REGEX,
    tokenize,
    wordcount,
)

__all__ = ["TOKEN_SPLIT_REGEX", "tokenize", "wordcount"]
