"""Text column helpers: chunking, tokenization, shingling, stats.

Chunking reproduces the reference's paragraph pipeline
(``Qdrant/main.py:36-46``): split on a delimiter, trim, drop empties,
enumerate position within the parent row, filter by minimum length.
The delimiter is a parameter because the reference's ``"\\n\\n"`` is
just one instance of the same row-generator shape.

Everything here is a JVM-side expression (split / explode / regexp /
higher-order functions) — no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
import pyspark.sql.functions as F

# One explicit ASCII whitespace class shared between Spark (Java regex)
# and the DuckDB oracle (RE2).  Java's \s includes \x0B (vertical tab);
# RE2's does not, so a bare \s in any paired pattern can silently
# diverge on \x0B-bearing text.  This is defensive cross-engine parity
# hardening (pinned by tests/test_whitespace_parity.py), NOT the cause
# of the r5 sequence_packing driver mismatch — that was the oracle
# emitting a DuckDB HUGEINT column, which the driver's pandas fetch
# coerces to float64 (fixed in queries_training.py with ::BIGINT).
# \x{000b} parses identically in both engines — never use an implicit
# \s in a pattern that has an oracle twin.
ASCII_WS = r" \t\n\x{000b}\f\r"
WS_SPLIT = rf"[{ASCII_WS}]+"

# token pattern shared with the DuckDB oracle: words, digit runs, or a
# single non-space symbol (BPE-ish pre-tokenizer shape)
TOKEN_PATTERN = rf"[A-Za-z]+|[0-9]+|[^A-Za-z0-9{ASCII_WS}]"

PUNCT_PATTERN = rf"[^\w{ASCII_WS}]"

# Python str.strip() whitespace (str.isspace() == True): ASCII
# whitespace plus the C1/Unicode space characters.  Java regex and RE2
# (DuckDB) both accept the \x{...} escapes, so the same class works in
# both engines.
PY_SPACE_CLASS = (
    rf"[{ASCII_WS}\x{{001c}}-\x{{001f}}\x{{0085}}\x{{00a0}}\x{{1680}}"
    r"\x{2000}-\x{200a}\x{2028}\x{2029}\x{202f}\x{205f}\x{3000}]"
)


def py_strip(text: Column | str) -> Column:
    """Python str.strip() twin: trims *Unicode* whitespace, which Spark's
    ``trim()`` (ASCII-only) does not — the reference strips with Python
    semantics (``Qdrant/llm.py:24``), and hypothesis found the \\xa0
    divergence."""
    text = F.col(text) if isinstance(text, str) else text
    return F.regexp_replace(
        text, f"^{PY_SPACE_CLASS}+|{PY_SPACE_CLASS}+$", ""
    )

# tiny per-language stopword lists for the n-gram/stopword language
# heuristic (lang_id_expr); deliberately small + deterministic
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "that"),
    "es": ("el", "la", "de", "y", "que", "en", "los", "del"),
    "de": ("der", "die", "das", "und", "zu", "den", "von", "ist"),
    "fr": ("le", "la", "de", "et", "les", "des", "en", "est"),
    "zh": ("de", "shi", "le", "zai", "you", "he", "wo", "ta"),
}


def words(text: Column | str) -> Column:
    """Whitespace words, trimmed, empties dropped.

    Splits on the explicit ``WS_SPLIT`` class (identical to Java
    ``\\s+``) so the DuckDB oracle twin ``registry.sql_words`` can use
    the very same pattern — RE2's ``\\s`` lacks ``\\x0B``.
    """
    text = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(F.trim(text), WS_SPLIT), lambda w: w != "")


def token_count(text: Column | str, pattern: str = TOKEN_PATTERN) -> Column:
    text = F.col(text) if isinstance(text, str) else text
    return F.size(F.regexp_extract_all(text, F.lit(pattern), F.lit(0)))


def char_count(text: Column | str) -> Column:
    text = F.col(text) if isinstance(text, str) else text
    return F.length(text)


def punct_count(text: Column | str) -> Column:
    text = F.col(text) if isinstance(text, str) else text
    return F.size(F.regexp_extract_all(text, F.lit(PUNCT_PATTERN), F.lit(0)))


def stopword_count(text: Column | str, stopwords: tuple[str, ...]) -> Column:
    """Count of word occurrences (not distinct) in the stopword list."""
    sw = F.array(*[F.lit(s) for s in stopwords])
    return F.size(F.filter(words(text), lambda w: F.array_contains(sw, F.lower(w))))


def word_shingles(text: Column | str, n: int = 3) -> Column:
    """Distinct n-word shingles joined by single spaces.

    Built by folding zip_with over shifted slices of the word array —
    shingle i = w[i] ⧺ ' ' ⧺ w[i+1] ⧺ … — which is ~6x faster than a
    per-index transform+slice (no per-shingle array allocation).
    Rows with fewer than n words produce one short shingle (the full
    text), which is still a stable key.
    """
    ws = words(text)
    cnt = F.size(ws)
    acc = ws
    for shift in range(2, n + 1):
        shifted = F.slice(
            ws, shift, F.greatest(cnt - (shift - 1), F.lit(0))
        )
        acc = F.zip_with(
            acc,
            shifted,
            lambda x, y: F.when(
                x.isNotNull() & y.isNotNull(), F.concat(x, F.lit(" "), y)
            ),
        )
    full = F.filter(acc, lambda s: s.isNotNull())
    return F.array_distinct(
        F.when(cnt < n, F.array(F.array_join(ws, " "))).otherwise(full)
    )


def paragraph_chunks(
    df: DataFrame,
    text_col: str = "text",
    delimiter: str = "\n\n",
    min_len: int = 50,
    out_col: str = "chunk_text",
    index_col: str = "chunk_index",
) -> DataFrame:
    """Split → trim → drop empty → posexplode → min-length filter.

    chunk_index counts kept-nonempty paragraphs per parent row *before*
    the min-length filter, matching the reference's enumerate-then-skip
    order (``Qdrant/main.py:40-45``: index increments only for paragraphs
    that pass the emptiness strip, while short ones are skipped after
    claiming their index — actually in the reference the index is the
    position among non-empty paragraphs and short paragraphs do consume
    an index only if non-empty; we reproduce that: enumerate non-empty,
    then filter by length).
    """
    parts = F.filter(
        F.transform(F.split(F.col(text_col), F.lit(delimiter).cast("string")),
                    lambda p: py_strip(p)),
        lambda p: p != "",
    )
    exploded = df.select(
        *[F.col(c) for c in df.columns],
        F.posexplode(parts).alias(index_col, out_col),
    )
    return exploded.filter(F.length(F.col(out_col)) >= min_len)


def lang_id_expr(text: Column | str) -> Column:
    """Stopword-vote language heuristic: pick the language whose stopword
    list matches the most word occurrences; ties break alphabetically;
    zero matches → 'und' (undetermined).

    For one-shot use on a text column.  When scoring a whole table,
    pre-tokenize once (``select(transform(words(text), lower).alias(c)``)
    and pass that column to ``lang_id_from_words`` — otherwise the
    tokenization expression is duplicated into every language counter.
    """
    text = F.col(text) if isinstance(text, str) else text
    return lang_id_from_words(F.transform(words(text), F.lower))


def lang_id_from_words(ws_lower: Column | str) -> Column:
    """Language vote over a pre-tokenized lowercase word array."""
    ws_lower = F.col(ws_lower) if isinstance(ws_lower, str) else ws_lower

    def count_for(sw: tuple[str, ...]) -> Column:
        arr = F.array(*[F.lit(s) for s in sw])
        return F.size(F.filter(ws_lower, lambda w: F.array_contains(arr, w)))

    scored = F.array(
        *[
            F.struct(
                count_for(sw).alias("score"),
                F.lit(lang).alias("lang"),
            )
            for lang, sw in sorted(LANG_STOPWORDS.items())
        ]
    )
    # max by (score, reversed-lang): array_max on struct compares fields
    # in order; to break score ties toward the alphabetically-first lang
    # we sort ascending and take the last element with strictly greater
    # score ordering — simpler: sort by score desc, lang asc via sort_array
    # on (negated score, lang) then take element 1.
    keyed = F.transform(
        scored,
        lambda s: F.struct(
            (-s["score"]).alias("neg"), s["lang"].alias("lang"), s["score"].alias("score")
        ),
    )
    best = F.sort_array(keyed)[0]
    return F.when(best["score"] <= 0, F.lit("und")).otherwise(best["lang"])
