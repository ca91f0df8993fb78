"""Client facade — the engine's user-facing API.

Mirrors the reference SDK's surface (``AgeDigitalTwinsClient``): query
with pagination, point CRUD, models.  Round-1 scope: query path; CRUD
is snapshot-functional (returns a new GraphStore) — Delta MERGE is the
cluster-deployment story (SURVEY.md §3.2).
"""

from __future__ import annotations

import base64
import json
from dataclasses import dataclass

from pyspark.sql import DataFrame

from pg_age_digitaltwins_spark.adtql.compiler import QueryCompiler
from pg_age_digitaltwins_spark.adtql.parser import parse
from pg_age_digitaltwins_spark.store.graph_store import GraphStore


@dataclass
class QueryPage:
    rows: list[dict]
    continuation_token: str | None


class DigitalTwinsSparkClient:
    def __init__(self, store: GraphStore):
        self.store = store

    # ------------------------------------------------------------------
    def query_df(self, query: str, order_for_paging: bool = False) -> DataFrame:
        """Compile an ADT QL query to a DataFrame (lazy)."""
        return QueryCompiler(self.store).compile(parse(query), order_for_paging)

    def query(
        self,
        query: str,
        max_items_per_page: int | None = None,
        continuation_token: str | None = None,
    ) -> QueryPage:
        """Paged execution with continuation tokens.

        Token = base64 ``{"_tr": <row offset>, "_q": <query>}`` — same
        shape as the reference (``Models/ContinuationToken.cs:9-16``),
        except our offset is against an explicit deterministic sort (the
        reference leans on Postgres scan stability, SURVEY.md §4)."""
        offset = 0
        if continuation_token:
            tok = json.loads(base64.b64decode(continuation_token))
            offset = int(tok["_tr"])
            query = tok["_q"]
        df = self.query_df(query, order_for_paging=max_items_per_page is not None)
        if max_items_per_page is None:
            return QueryPage([r.asDict(recursive=True) for r in df.collect()], None)
        page = df.offset(offset).limit(max_items_per_page + 1).collect()
        rows = [r.asDict(recursive=True) for r in page[:max_items_per_page]]
        token = None
        if len(page) > max_items_per_page:
            token = base64.b64encode(
                json.dumps({"_tr": offset + max_items_per_page, "_q": query}).encode()
            ).decode()
        return QueryPage(rows, token)

    # ------------------------------------------------------------------
    def query_charge(self, page: QueryPage) -> float:
        """Charge = rows + total top-level properties (reference
        arithmetic, ``Query.cs:240-257``; aggregate/var-len surcharges
        applied by the caller)."""
        charge = float(len(page.rows))
        for row in page.rows:
            charge += len(row)
        return charge
