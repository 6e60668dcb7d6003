"""Arrow-path text primitives — the text ops the JVM cannot express.

``functions/text.py`` is deliberately pure Catalyst; this module holds
the exception. Spark has no NFC/NFKC builtin, and normalization MUST
precede fingerprint/shingle dedup on real corpora — "ﬁle" (ligature)
vs "file", composed vs decomposed accents, full-width vs ASCII digits
are byte-different but the same text, so un-normalized dedup
under-merges. stdlib ``unicodedata`` inside a vectorized
``pandas_udf`` keeps the JVM↔Python transfer Arrow-batched (never
row-pickled) — the same deliberate Arrow-stage budget as the codec
decodes in ``operators/multimodal.py``: Python only where the JVM has
no equivalent expression, and always batched.
"""

from __future__ import annotations

import unicodedata

import pandas as pd

from pyspark.sql import Column
from pyspark.sql.functions import pandas_udf

_FORMS = ("NFC", "NFD", "NFKC", "NFKD")


def normalize_unicode(col: Column, *, form: str = "NFKC") -> Column:
    """Unicode-normalize a string column (nulls pass through)."""
    if form not in _FORMS:
        raise ValueError(f"form must be one of {_FORMS}, got {form!r}")

    @pandas_udf("string")
    def _norm(s: pd.Series) -> pd.Series:
        return s.map(
            lambda x: unicodedata.normalize(form, x) if x is not None else None
        )

    return _norm(col)


def compression_ratio(col: Column, *, level: int = 6) -> Column:
    """Per-document zlib compression ratio (compressed/original bytes) —
    the classic repetitiveness signal for corpus quality filtering:
    templated or boilerplate-looped text compresses far below natural
    prose (~0.3-0.6), machine-generated repetition approaches the
    run-length floor, and high-entropy junk exceeds ~1. Same
    Arrow-batch budget as ``normalize_unicode``: the JVM has no
    per-row compressor expression. Null -> null, empty -> null (no
    bytes to measure — a 0-byte document is a length-rule concern,
    not a redundancy one).
    """
    import zlib

    if not 1 <= level <= 9:
        raise ValueError(f"level must be in [1, 9], got {level}")

    @pandas_udf("double")
    def _ratio(s: pd.Series) -> pd.Series:
        def one(x):
            if x is None:
                return None
            raw = x.encode("utf-8")
            if not raw:
                return None
            return len(zlib.compress(raw, level)) / len(raw)

        return s.map(one)

    return _ratio(col)
