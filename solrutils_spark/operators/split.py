"""T5/E6 — result-set splitting with highlighting (SearchSplitComponent twin).

Reference semantics (SearchSplitComponent.java:34-108): one query produces
TWO ranked lists — the main list gets a MUST_NOT of the split filter injected
before the search (:43-49), the split list is the complementary query with
its own rows/fl (:59-89) and highlighted snippets (:92-104).

Spark shape: score ONCE (cache), branch into ``filter(~p)`` and ``filter(p)``
with separate limits — the expensive scoring pass is shared, the branches are
cheap. Highlighting is a vectorized snippet extraction around the first
matched term (E6).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from solrutils_spark.operators.util import _extend_schema

from solrutils_spark.functions.analyzer import analyze


def split_results(
    scored_docs: DataFrame,
    split_predicate: str,
    main_rows: int = 10,
    split_rows: int = 10,
    main_fl: list[str] | None = None,
    split_fl: list[str] | None = None,
    id_column: str = "doc_id",
) -> tuple[DataFrame, DataFrame]:
    """scored_docs: docs joined with scores. Returns (main, split) ranked lists."""
    scored_docs = scored_docs.cache()
    order = [F.desc("score"), F.asc(id_column)] if "score" in scored_docs.columns else [F.asc(id_column)]
    pred = F.expr(split_predicate)
    main = scored_docs.filter(~pred).orderBy(*order).limit(main_rows)
    split = scored_docs.filter(pred).orderBy(*order).limit(split_rows)
    if main_fl:
        main = main.select(*main_fl)
    if split_fl:
        split = split.select(*split_fl)
    return main, split


def highlight(
    df: DataFrame,
    query_text: str,
    content_col: str = "content",
    snippet_chars: int = 120,
    out_col: str = "highlight",
) -> DataFrame:
    """E6 — snippet around the first query-term match, term wrapped in <em>.

    Arrow-batched (mapInPandas); the match uses the same analyzer token
    boundaries as scoring so highlighted terms are the scored terms.
    """
    terms = sorted(set(analyze(query_text)), key=len, reverse=True)
    schema = _extend_schema(df, out_col, "string")
    cols = df.columns

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import re

        pat = re.compile(
            "(" + "|".join(re.escape(t) for t in terms) + ")", re.IGNORECASE
        ) if terms else None

        for pdf in batches:
            def snip(text: str) -> str | None:
                if pat is None or not isinstance(text, str):
                    return None
                m = pat.search(text)
                if m is None:
                    return None
                lo = max(0, m.start() - snippet_chars // 2)
                hi = min(len(text), m.end() + snippet_chars // 2)
                window = text[lo:hi]
                return pat.sub(r"<em>\1</em>", window)

            pdf[out_col] = pdf[content_col].map(snip)
            yield pdf[cols + [out_col]]

    return df.mapInPandas(gen, schema=schema)
