"""SQL entry point: the reference has no query language (SURVEY §1 —
one fixed dataflow); this engine exposes full Spark SQL over the table
set, so any query in this repo — and any ad-hoc one — can run as a SQL
string too.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from cc_mapreducer_spark.tables import TABLE_NAMES, load_table

# The sf_dir whose views are CURRENTLY registered, per session:
# re-registering all 10 tables on every ad-hoc sql() call would re-run 10
# parquet analyses (plus the events schema probe) per query for identical
# views. One slot per session (views are globally named, so only one
# sf_dir can be active at a time) — switching dirs re-registers, and
# switching BACK re-registers again rather than serving the wrong tables.
_ACTIVE_SF_DIR: dict[str, str] = {}


def register_views(spark: SparkSession, sf_dir: str, force: bool = False) -> None:
    """Expose every driver table as a temp view (same names DuckDB's
    oracle layer uses), including the events nanos->micros normalization
    from load_table. Idempotent while sf_dir is unchanged; pass
    force=True after replacing the files at sf_dir in-session."""
    app = spark.sparkContext.applicationId
    for k in [k for k in _ACTIVE_SF_DIR if k != app]:  # evict stopped sessions
        del _ACTIVE_SF_DIR[k]
    if _ACTIVE_SF_DIR.get(app) == sf_dir and not force:
        return
    # sf_dir is changing (or force): derived views built over the OLD dir
    # must not survive the base re-point — drop them so stale plans fail
    # loudly on next access instead of silently mixing directories
    for stale in _DERIVED_VIEWS.pop(app, set()):
        spark.catalog.dropTempView(stale)
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
    _ACTIVE_SF_DIR[app] = sf_dir


def sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(query)


# Derived views registered per session (view name set): when the active
# sf_dir switches, these must be DROPPED — a derived view still holding
# the old directory's plan would silently mix sources with the re-pointed
# base views, the exact corruption the one-slot base design prevents.
_DERIVED_VIEWS: dict[str, set[str]] = {}


def register_query_views(
    spark: SparkSession, sf_dir: str, names: list[str]
) -> list[str]:
    """Expose registered operator queries as named temp views, so a
    pipeline OUTPUT (cdc_snapshot, text_profile, shared_passages, ...)
    is ad-hoc SQL-queryable and joinable against the base tables.
    Returns the view names registered.

    ``names`` is REQUIRED: several operator functions legitimately run
    driver-side work while BUILDING their plan (query-block collects,
    codebook training, iterative rounds), so registering every key
    would launch dozens of jobs as a side effect — name what you need.
    The view holds the plan built now; values collected during plan
    construction are frozen into it (re-register to refresh).

    Keys colliding with a base table are skipped (base views win —
    shadowing `events` with a derived result would corrupt every later
    query). Switching sf_dir drops previously registered derived views
    (loud failure beats silently mixing directories)."""
    from cc_mapreducer_spark import registry

    register_views(spark, sf_dir)
    app = spark.sparkContext.applicationId
    queries = registry.all_queries()
    out = []
    for name in names:
        if name in TABLE_NAMES:
            continue
        queries[name](spark, sf_dir).createOrReplaceTempView(name)
        _DERIVED_VIEWS.setdefault(app, set()).add(name)
        out.append(name)
    return out
