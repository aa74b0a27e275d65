"""T4/E8 — elevation-style re-ranking (QueryReRankComponent.java:41-95 twin).

Reference semantics: for each configured elevation block, run its filters,
take the top ``rows`` ids EXCLUDING ids collected by earlier blocks
(progressive exclusion, :71-79), then force all collected ids to the top of
the main result (``elevateIds``, :88-93) in block order.

Spark shape: each block is a cheap filter+limit collect of ids (strata are
tiny by construction); elevation is a priority column —
``orderBy(priority asc, score desc, doc_id)`` — never a second scoring pass.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class ElevationBlock:
    """One <elevation> config: filters + rows (QueryReRankComponent.java:49-68)."""

    filters: list[str] = field(default_factory=list)  # SQL exprs over the collection
    rows: int = 5
    sort: str | None = None  # optional 'field dir' ordering within the block


def collect_elevation_ids(
    collection: DataFrame, blocks: list[ElevationBlock], id_column: str = "doc_id"
) -> list[list[int]]:
    """Run blocks in order, each excluding ids already taken (MUST_NOT, P6)."""
    taken: set[int] = set()
    strata: list[list[int]] = []
    for blk in blocks:
        df = collection
        for fq in blk.filters:
            df = df.filter(F.expr(fq))
        if taken:
            df = df.filter(~F.col(id_column).isin(list(taken)))  # anti-exclusion
        if blk.sort:
            toks = blk.sort.rsplit(" ", 1)
            col = F.col(toks[0])
            df = df.orderBy(col.desc() if len(toks) > 1 and toks[1] == "desc" else col.asc())
        ids = [r[id_column] for r in df.select(id_column).limit(blk.rows).collect()]
        strata.append(ids)
        taken.update(ids)
    return strata


def elevate(
    results: DataFrame, strata: list[list[int]], id_column: str = "doc_id"
) -> DataFrame:
    """Force stratum ids to the top in stratum order, then by original rank."""
    priority = F.lit(len(strata))
    for i in range(len(strata) - 1, -1, -1):
        if strata[i]:
            priority = F.when(F.col(id_column).isin(strata[i]), F.lit(i)).otherwise(priority)
    order = [F.asc("_priority")]
    if "score" in results.columns:
        order.append(F.desc("score"))
    order.append(F.asc(id_column))
    return (
        results.withColumn("_priority", priority).orderBy(*order).drop("_priority")
    )
