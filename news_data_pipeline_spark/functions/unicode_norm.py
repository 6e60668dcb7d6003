"""Unicode normalization — the one text primitive that needs an Arrow
stage.

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
