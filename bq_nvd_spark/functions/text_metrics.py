"""Text-metric expression factories (E4) — the Column-level forms of the
computations the registered document queries run inline."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def token_count(text: Column | str, sep: str = " ") -> Column:
    """Whitespace token count."""
    return F.size(F.split(_col(text), sep)).cast("long")


def avg_token_len(text: Column | str, sep: str = " ") -> Column:
    """Mean token length: (chars - separators) / tokens."""
    n = F.size(F.split(_col(text), sep))
    return (F.length(_col(text)) - (n - 1)).cast("double") / n


def stopword_ratio(
    text: Column | str, stopwords: tuple[str, ...] = ("the", "a"), sep: str = " "
) -> Column:
    """Fraction of tokens that are stopwords."""
    toks = F.split(_col(text), sep)
    hits = F.size(F.filter(toks, lambda t: t.isin(*stopwords)))
    return hits.cast("double") / F.size(toks)


def rolling_fingerprint(text: Column | str, mod: int = 1_000_000_007) -> Column:
    """Polynomial rolling hash over characters (h = h*31 + code mod m) —
    exact integer math, reproducible in any engine."""
    return F.aggregate(
        F.split(_col(text), ""),
        F.lit(0).cast("long"),
        lambda acc, ch: (acc * 31 + F.ascii(ch)) % F.lit(mod).cast("long"),
    )
