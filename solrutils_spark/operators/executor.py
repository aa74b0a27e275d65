"""PlanExecutor — run a compiled QueryPlan against Spark (the Solr crossing).

This is the engine's equivalent of the reference handing the compiled
SolrQuery to Solr's SearchHandler (CustomSearchHandler.java:170-172): it
interprets the plan's param multimap into DataFrame operations and assembles
the response dict, then runs the response-handler chain
(CustomSearchHandler.java:174-179 semantics).

Param interpretation:

- ``q``        query TEXT for BM25 (IndexReader path) — '*:*'/absent = match-all
- ``fq``*      Spark SQL boolean expressions over the collection's columns
               (pushed down by Catalyst); when SQL rejects the string and
               it carries Lucene operator syntax, the boolean executor
               supplies the match domain instead — incl. text-term filters
               through the index (round 5). Non-scoring (P2), ANDed.
- ``sort``     'field dir[, field dir]' → orderBy (T1); default = relevance
- ``rows``/``start``  top-k + offset paging (T3)
- ``fl``       projection (P4) — column pruning
- ``facet.field`` / ``facet.query`` / ``facet.range`` + ``json.facet``  (A2-A5)
  computed over the FILTERED, UNPAGED domain (Solr semantics)

Execution shape at scale: one scored pass (WAND top-k) + one agg pass per
facet family over the same filtered domain (cached when both are needed);
the response carries only top-k rows and facet buckets to the driver.
"""

from __future__ import annotations

import logging
import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

LOG = logging.getLogger("solrutils_spark.search")

from solrutils_spark.operators.facets import (
    field_facet,
    json_facet,
    query_facets,
    range_facet,
)
from solrutils_spark.plans.model import SearchModel
from solrutils_spark.plans.plan import QueryPlan, parse_json_facet
from solrutils_spark.query.engine import IndexReader


class PlanExecutor:
    def __init__(
        self,
        collection: DataFrame,
        reader: IndexReader | None = None,
        id_column: str = "doc_id",
        filter_cache_size: int = 32,
    ):
        self.collection = collection
        self.reader = reader
        self.id_column = id_column
        # Solr filterCache twin: fq expressions recur across requests, so the
        # filtered doc_id domain is persisted per distinct fq-set and reused
        # (Solr caches the DocSet per fq; BulkUpdateHandler.java:57-61 leans
        # on it). LRU-bounded; entries unpersist on eviction.
        self.filter_cache_size = filter_cache_size
        self._filter_cache: dict[tuple[str, ...], DataFrame] = {}

    # -- public API ----------------------------------------------------------
    def search(self, model: SearchModel, json_query: dict) -> dict:
        """Full lifecycle: compile JSON → plan → execute → response dict.

        Appends ``RTime`` (total request wall ms) to the response header and
        emits the reference's ``[reporting] query numFound time`` log record
        (CustomSearchHandler.java:111,186,256-258) — consumable by
        :mod:`solrutils_spark.operators.stats_report`.
        """
        t0 = time.perf_counter()
        plan = QueryPlan(searcher=self.execute)
        model.build(plan, json_query)
        response = self.execute(plan)
        rtime = int(1000 * (time.perf_counter() - t0))
        response.setdefault("responseHeader", {})["RTime"] = rtime
        q = plan.get_param("q", "")
        num_found = response.get("response", {}).get("numFound", 0)
        LOG.info(
            '[reporting] %s query="%s" numFound=%d time=%d',
            time.strftime("%Y-%m-%dT%H:%M:%S"), q, num_found, rtime,
        )
        return response

    def execute(self, plan: QueryPlan) -> dict:
        domain = self._filtered_domain(plan)
        q = plan.get_param("q")
        rows = int(float(plan.get_param("rows", "10")))
        start = int(float(plan.get_param("start", "0")))
        scored = self.reader is not None and q not in (None, "", "*:*")

        need_facets = bool(
            plan.get_params("facet.field")
            or plan.get_params("facet.query")
            or plan.get_params("facet.range")
            or plan.get_param("json.facet")
        )

        if scored:
            # fq filters ride along as a DataFrame — the reader cogroups the
            # filtered domain's ids with the postings by salt slice, so the
            # filter never materializes on the driver and WAND pruning stays
            # on (BulkUpdateHandler.java:57-61 DocSet semantics, distributed)
            filter_df = (
                self._cached_filter_ids(plan) if plan.get_params("fq") else None
            )
            from solrutils_spark.query.qparser import is_lucene_syntax

            if is_lucene_syntax(q):
                # the reference's templates can render Lucene operator
                # syntax into q (Query.java:10-31); route through the
                # boolean executor. Plain term queries stay on the ranked
                # WAND path (identical BM25 contributions, faster engine).
                from solrutils_spark.query.qparser import boolean_scored

                bscored = boolean_scored(self.reader, q)
                if bscored is None:
                    bscored = self.reader.spark.createDataFrame(
                        [], "doc_id long, score double"
                    )
                if filter_df is not None:
                    bscored = bscored.join(
                        filter_df.select(
                            F.col(filter_df.columns[0]).cast("long")
                            .alias(self.id_column)
                        ),
                        self.id_column, "leftsemi",
                    )
                ranked = bscored.orderBy(
                    F.desc("score"), F.asc(self.id_column)
                ).limit(rows + start)
                topk = ranked.offset(start) if start else ranked
                hits = self.reader.fetch(topk, self._fl(plan))
                # the boolean match domain doubles as numFound AND the facet
                # domain (persisted once below, reused by every action)
                facet_domain = domain.join(
                    bscored.select(self.id_column), self.id_column, "left_semi"
                )
            else:
                topk = self.reader.search(q, rows, offset=start,
                                          filter_df=filter_df)
                hits = self.reader.fetch(topk, self._fl(plan))
                facet_domain = (
                    self._scored_domain(domain, q) if need_facets else None
                )
        else:
            ordered = self._sorted(domain, plan)
            hits = ordered.offset(start).limit(rows) if start else ordered.limit(rows)
            fl = self._fl(plan)
            if fl is None and "content" in hits.columns and len(hits.columns) > 1:
                # default response omits the document body — the scored path's
                # fetch() default does the same; callers get it back via fl.
                # Keeps content bytes off the driver collect.
                fl = [c for c in hits.columns if c != "content"]
            if fl:
                hits = hits.select(*fl)
            facet_domain = domain if need_facets else None

        # ONE domain computation per request: numFound + every facet family
        # all act on facet_domain, and for scored requests each action would
        # otherwise re-run the full query-term postings decode (the
        # reference's SearchOp.java:133-148 holds one searcher snapshot per
        # request). Persist for the life of the request, release at the end.
        persisted = facet_domain.persist() if facet_domain is not None else None
        facet_domain = persisted if persisted is not None else facet_domain
        try:
            docs = [r.asDict(recursive=True) for r in hits.collect()]
            if facet_domain is not None:
                num_found = facet_domain.count()
            elif scored and not plan.get_params("fq"):
                # exact hit count without materializing doc_ids: single-term =
                # sidecar df lookup (no job); multi-term = per-slice unique counts
                num_found = self.reader.matching_count(q)
            elif scored:
                num_found = self._scored_domain(domain, q).count()
            else:
                num_found = domain.count()
            response: dict = {
                "responseHeader": {"params": {k: v for k, v in plan.params.items()}},
                "response": {"numFound": num_found, "start": start, "docs": docs},
            }
            if need_facets:
                self._add_facets(plan, facet_domain, response)
            for handler in plan.response_handlers:
                handler.process(plan, response)
            return response
        finally:
            if persisted is not None:
                persisted.unpersist()

    # -- internals -----------------------------------------------------------
    def _fl(self, plan: QueryPlan) -> list[str] | None:
        fl = plan.get_param("fl")
        return [f.strip() for f in fl.split(",")] if fl else None

    def _filtered_domain(self, plan: QueryPlan) -> DataFrame:
        df = self.collection
        for fq in plan.get_params("fq") or []:
            df = self._apply_fq(df, fq)
        return df

    def _apply_fq(self, df: DataFrame, fq: str) -> DataFrame:
        """One fq body. Spark-SQL boolean expressions keep first claim on
        the string (the established template style — and SQL analysis is
        eager, so a mismatch is known immediately, never a silent
        misfilter); when SQL REJECTS it and the string carries Lucene
        operator syntax, it runs through the boolean executor as a match
        DOMAIN over the index — FilterQuery.java:11-64 renders the same
        template syntax into fq as into q, including text-term filters
        like ``content:posting AND lang:py``. Filters restrict, they
        NEVER score. A Lucene-marker string neither engine accepts
        re-raises the SQL error plus the parser's — loud, per contract."""
        from solrutils_spark.query.qparser import (
            apply_boolean_filter,
            is_lucene_syntax,
        )

        try:
            return df.filter(F.expr(fq))
        except Exception as sql_err:
            # not only AnalysisException/ParseException: Spark 4 reads
            # ``lang:py`` as VARIANT path syntax and rejects it with a
            # wrapped SparkException — any eager-analysis rejection means
            # "not SQL over this schema", and the Lucene attempt below
            # happens only BECAUSE SQL raised (never a silent reroute)
            if self.reader is None or not is_lucene_syntax(fq):
                raise
            try:
                # pure-negative fq bodies get Solr's match-all-minus-matches
                # rewrite inside apply_boolean_filter (r5 ADVICE, medium)
                return apply_boolean_filter(df, self.id_column, self.reader, fq)
            except Exception as lucene_err:
                # chain so BOTH rejections surface (r5 ADVICE, low): the
                # docstring's "re-raises the SQL error plus the parser's"
                raise lucene_err from sql_err

    def _cached_filter_ids(self, plan: QueryPlan) -> DataFrame:
        """Persisted doc_id domain for the plan's fq set (filterCache twin).

        When a reader is attached, the cached domain is pre-salted AND
        hash-partitioned by salt, so repeated scored+fq requests elide the
        filter-side exchange of the cogroup entirely (the Solr analog keeps
        cached DocSets in index order)."""
        key = tuple(sorted(plan.get_params("fq") or []))
        hit = self._filter_cache.pop(key, None)
        if hit is None:
            ids = self._filtered_domain(plan).select(self.id_column)
            if self.reader is not None:
                ids = self.reader.salted_filter(ids)
                # co-partition with the serving cache so the cogroup elides
                # BOTH exchanges (a mismatched count re-exchanges the pruned
                # candidate rows per query — cache_for_serving docstring)
                n = self.reader._serving_partitions
                ids = (ids.repartition(n, "salt") if n is not None
                       else ids.repartition("salt"))
            hit = ids.persist()
            if len(self._filter_cache) >= self.filter_cache_size:
                oldest = next(iter(self._filter_cache))  # least-recently-used
                self._filter_cache.pop(oldest).unpersist()
        self._filter_cache[key] = hit  # re-insert → most-recently-used
        return hit

    def _scored_domain(self, domain: DataFrame, q: str) -> DataFrame:
        """Docs matching ≥1 query term AND all filters (the facet domain)."""
        matching = self.reader.matching_docs(q)
        return domain.join(matching, self.id_column, "left_semi")

    def _sorted(self, domain: DataFrame, plan: QueryPlan) -> DataFrame:
        sort = plan.get_param("sort")
        if not sort:
            return domain
        exprs = []
        for part in sort.split(","):
            part = part.strip()
            if not part:
                continue
            toks = part.rsplit(" ", 1)
            if len(toks) == 2 and toks[1].lower() in ("asc", "desc"):
                col = F.expr(toks[0])
                exprs.append(col.desc() if toks[1].lower() == "desc" else col.asc())
            else:
                exprs.append(F.expr(part).asc())
        return domain.orderBy(*exprs)

    def _add_facets(self, plan: QueryPlan, domain: DataFrame, response: dict) -> None:
        facet_fields: dict = {}
        for spec in plan.get_params("facet.field") or []:
            res = field_facet(
                domain,
                spec,
                limit=int(plan.get_param("facet.limit", "100")),
                mincount=int(plan.get_param("facet.mincount", "0")),
            )
            facet_fields[res["key"]] = res["counts"]
        facet_queries = query_facets(domain, plan.get_params("facet.query") or [],
                                     reader=self.reader,
                                     id_column=self.id_column)
        facet_ranges: dict = {}
        for spec in plan.get_params("facet.range") or []:
            field = spec.split("}", 1)[1] if spec.startswith("{!") else spec
            key = field if not spec.startswith("{!") else spec
            start = float(plan.get_param(f"f.{field}.facet.range.start", plan.get_param("facet.range.start", "0")))
            end = float(plan.get_param(f"f.{field}.facet.range.end", plan.get_param("facet.range.end", "0")))
            gap = float(plan.get_param(f"f.{field}.facet.range.gap", plan.get_param("facet.range.gap", "1")))
            facet_ranges[key] = range_facet(domain, field, start, end, gap)
        if facet_fields or facet_queries or facet_ranges:
            response["facet_counts"] = {
                "facet_fields": facet_fields,
                "facet_queries": facet_queries,
                "facet_ranges": facet_ranges,
            }
        jf = parse_json_facet(plan)
        if jf:
            response["facets"] = json_facet(domain, jf, reader=self.reader,
                                            id_column=self.id_column)
