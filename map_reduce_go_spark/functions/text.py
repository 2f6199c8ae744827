"""Text scalar functions shared by the MapReduce-parity queries and the
text-analysis extensions. All JVM-side built-ins — no Python UDFs — so they
stay inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Word boundary of the reference word-count app: any run of non-letters
#: (Go ``!unicode.IsLetter``, reference src/mrapps/wc.go:21-24). ``\p{L}``
#: is the same Unicode letter class in Java regex and in DuckDB's RE2, so
#: engine and oracle share one tokenizer definition (SURVEY.md §7.3).
WORD_BOUNDARY = r"[^\p{L}]+"


def tokenize(col: Column | str) -> Column:
    """contents -> array<string> of words, empty tokens removed.

    Go's ``FieldsFunc`` never yields empty strings; Spark's ``split`` yields
    empty leading/trailing tokens, so filter them (SURVEY.md §2.2 fine points).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(c, WORD_BOUNDARY), lambda w: F.length(w) > 0)


def exploded_words(df, text_col: str = "contents", out_col: str = "word"):
    """df + one row per word occurrence in ``text_col``."""
    return df.select("*", F.explode(tokenize(text_col)).alias(out_col))
