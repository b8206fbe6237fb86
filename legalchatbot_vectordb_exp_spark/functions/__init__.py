from legalchatbot_vectordb_exp_spark.functions.vector import (
    as_double_vec,
    cosine_sim,
    dot,
    l2_norm,
    l2_normalize,
)
from legalchatbot_vectordb_exp_spark.functions.text import (
    char_count,
    lang_id_expr,
    lang_id_from_words,
    paragraph_chunks,
    punct_count,
    py_strip,
    stopword_count,
    token_count,
    word_shingles,
    words,
)

__all__ = [
    "as_double_vec",
    "cosine_sim",
    "dot",
    "l2_norm",
    "l2_normalize",
    "char_count",
    "lang_id_expr",
    "lang_id_from_words",
    "paragraph_chunks",
    "punct_count",
    "py_strip",
    "stopword_count",
    "token_count",
    "word_shingles",
    "words",
]
