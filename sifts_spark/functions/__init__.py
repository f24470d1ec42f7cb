from sifts_spark.functions.text import (
    DEFAULT_TOKENIZER,
    TOKEN_SPLIT_RE,
    TOKEN_SPLIT_RE_PY,
    py_tokenize,
    tokenize,
    tokenize_sql,
    shingles,
    char_ngrams,
)
from sifts_spark.functions.vector import cosine_similarity, l2_norm, dot
from sifts_spark.functions.metadata import meta_get, compile_where, compile_order_by

__all__ = [
    "DEFAULT_TOKENIZER",
    "TOKEN_SPLIT_RE",
    "TOKEN_SPLIT_RE_PY",
    "py_tokenize",
    "tokenize",
    "tokenize_sql",
    "shingles",
    "char_ngrams",
    "cosine_similarity",
    "l2_norm",
    "dot",
    "meta_get",
    "compile_where",
    "compile_order_by",
]
