"""Tier A — control-plane dataflow queries (SURVEY.md SS2-A).

Each query is the Spark-first re-expression of logic the reference
implements imperatively in Java; file:line citations point into
/root/reference/src/main/java/org/apache/iceberg/aws/manage/.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import config, io
from ..operators import trigger
from ..registry import register

NOW = config.NOW_LITERAL
K = config.COMMIT_THRESHOLD
T_MS = config.TIME_THRESHOLD_MS
REPL = config.REPLACE_OPERATION

# ---------------------------------------------------------------------------
# A1 — event source scan (AwsTableManagementMetricsEvaluator.java:64-85)
# ---------------------------------------------------------------------------


@register(
    "events_scan",
    tier="A",
    oracle="SELECT event_id, ts, user_id, event_type, value, props FROM events",
)
def events_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1: the commit-report ingest, batch analog — full scan of the
    events table (the system's only input)."""
    return io.table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )


# ---------------------------------------------------------------------------
# A2+A3 — event-kind filter + null guard (:66-68)
# ---------------------------------------------------------------------------


@register(
    "commit_filter",
    tier="A",
    oracle="""
    SELECT event_id, ts, user_id, event_type
    FROM events
    WHERE event_type IS NOT NULL AND event_type <> 'view'
    """,
)
def commit_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2/A3: keep only write-path (commit) events, dropping scan
    reports ('view' plays the non-CommitReport role) and nulls —
    `if (report instanceof CommitReport)` (:68) +
    `Preconditions.checkArgument(null != report)` (:66)."""
    ev = io.table(spark, sf_dir, "events")
    return ev.filter(F.col("event_type").isNotNull() & (F.col("event_type") != "view")).select(
        "event_id", "ts", "user_id", "event_type"
    )


# ---------------------------------------------------------------------------
# A4 — identifier parse & namespace slice (AwsManageUtil.java:19-24)
# ---------------------------------------------------------------------------


@register(
    "table_identifier_parse",
    tier="A",
    oracle="""
    WITH ids AS (
      SELECT DISTINCT
        'cat' || CAST(user_id % 3 AS VARCHAR) || '.db' || CAST(user_id % 5 AS VARCHAR)
          || '.t' || CAST(user_id AS VARCHAR) AS full_name
      FROM events
    )
    SELECT full_name,
           array_to_string(string_split(full_name, '.')[2:], '.') AS table_identifier,
           string_split(full_name, '.')[1] AS catalog_name
    FROM ids
    """,
)
def table_identifier_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4: `catalog.db.table` -> strip the catalog level
    (`buildTableIdentifier`, AwsManageUtil.java:19-24) via
    split/slice/array_join — pure codegen'd string ops."""
    ev = io.table(spark, sf_dir, "events")
    ids = ev.select(
        F.concat(
            F.lit("cat"),
            (F.col("user_id") % 3).cast("string"),
            F.lit(".db"),
            (F.col("user_id") % 5).cast("string"),
            F.lit(".t"),
            F.col("user_id").cast("string"),
        ).alias("full_name")
    ).distinct()
    parts = F.split(F.col("full_name"), r"\.")
    return ids.select(
        "full_name",
        F.array_join(F.slice(parts, 2, F.size(parts) - 1), ".").alias("table_identifier"),
        F.element_at(parts, 1).alias("catalog_name"),
    )


# ---------------------------------------------------------------------------
# A5 — point lookup as broadcast join (:72 catalog.loadTable)
# ---------------------------------------------------------------------------


@register(
    "table_lookup_join",
    tier="A",
    oracle="""
    WITH dim AS (
      SELECT user_id, 't' || CAST(user_id AS VARCHAR) AS table_name, MIN(ts) AS created_at
      FROM events GROUP BY user_id
    )
    SELECT e.event_id, e.event_type, d.table_name, d.created_at
    FROM events e JOIN dim d ON e.user_id = d.user_id
    """,
)
def table_lookup_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5: `catalog.loadTable(identifier)` (:72) as a broadcast equi-join
    of the event stream against the (small) table-metadata dimension —
    the point lookup becomes a map-side join at scale."""
    ev = io.table(spark, sf_dir, "events")
    dim = ev.groupBy("user_id").agg(F.min("ts").alias("created_at")).select(
        "user_id",
        F.concat(F.lit("t"), F.col("user_id").cast("string")).alias("table_name"),
        "created_at",
    )
    return ev.join(F.broadcast(dim), "user_id").select(
        "event_id", "event_type", "table_name", "created_at"
    )


# ---------------------------------------------------------------------------
# A6-A10 — the trigger evaluator (the flagship)
# ---------------------------------------------------------------------------

_RANKED_CTE = f"""
  snapshots AS ({io.SNAPSHOTS_CTE}),
  ranked AS (
    SELECT table_name, snapshot_id, ts, operation,
           ROW_NUMBER() OVER (PARTITION BY table_name ORDER BY ts DESC, snapshot_id DESC) AS lineage_rank
    FROM snapshots
  )
"""

_PENDING_CTE = f"""
  {_RANKED_CTE},
  flagged AS (
    SELECT *,
           MIN(CASE WHEN operation = '{REPL}' THEN lineage_rank END)
             OVER (PARTITION BY table_name) AS replace_rank
    FROM ranked
  ),
  pending AS (
    SELECT table_name, snapshot_id, ts, operation, lineage_rank
    FROM flagged
    WHERE replace_rank IS NULL OR lineage_rank < replace_rank
  )
"""

_DECISION_CTE = f"""
  {_PENDING_CTE},
  agged AS (
    SELECT table_name, COUNT(*) AS n_pending,
           MAX(epoch_ms(TIMESTAMP '{NOW}') - epoch_ms(ts)) AS max_age
    FROM pending GROUP BY table_name
  ),
  decision AS (
    SELECT t.table_name,
           COALESCE(a.n_pending, 0) AS n_commits_since_replace,
           CAST(COALESCE(a.max_age, -1) AS BIGINT) AS max_pending_age_ms,
           COALESCE(a.max_age, -1) >= {T_MS} AS time_trigger,
           COALESCE(a.n_pending, 0) >= {K} AS commit_trigger,
           (COALESCE(a.max_age, -1) >= {T_MS} OR COALESCE(a.n_pending, 0) >= {K}) AS should_optimize
    FROM (SELECT DISTINCT table_name FROM snapshots) t
    LEFT JOIN agged a ON t.table_name = a.table_name
  )
"""


@register(
    "snapshot_lineage_scan",
    tier="A",
    oracle=f"WITH {_RANKED_CTE} SELECT * FROM ranked",
)
def snapshot_lineage_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6: latest-first snapshot lineage per table
    (`SnapshotUtil.currentAncestors`, :74,108-112) as a ranked window."""
    return trigger.rank_lineage(io.snapshots(spark, sf_dir))


@register(
    "commits_since_last_replace",
    tier="A",
    oracle=f"WITH {_PENDING_CTE} SELECT * FROM pending",
)
def commits_since_last_replace(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7: anti-range filter — only snapshots strictly newer than the
    newest REPLACE commit survive (the `DataOperations.REPLACE` stop,
    :114-117)."""
    return trigger.pending_since_replace(io.snapshots(spark, sf_dir))


@register(
    "time_threshold_trigger",
    tier="A",
    oracle=f"WITH {_DECISION_CTE} SELECT table_name, max_pending_age_ms, time_trigger FROM decision",
)
def time_threshold_trigger(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8: fire when any pending snapshot is older than
    time-threshold-ms vs a parameterized `now` (:119-126; default 3 h,
    AwsManageProperties.java:15-18)."""
    return trigger.decide_optimize(io.snapshots(spark, sf_dir)).select(
        "table_name", "max_pending_age_ms", "time_trigger"
    )


@register(
    "commit_threshold_trigger",
    tier="A",
    oracle=f"WITH {_DECISION_CTE} SELECT table_name, n_commits_since_replace, commit_trigger FROM decision",
)
def commit_threshold_trigger(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9: counting aggregation + HAVING — fire at commit-threshold
    commits since the last optimize (:128-135; default 10,
    AwsManageProperties.java:11-13)."""
    return trigger.decide_optimize(io.snapshots(spark, sf_dir)).select(
        "table_name", "n_commits_since_replace", "commit_trigger"
    )


@register(
    "should_optimize_decision",
    tier="A",
    oracle=f"WITH {_DECISION_CTE} SELECT * FROM decision",
)
def should_optimize_decision(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A10 — THE FLAGSHIP: full `shouldOptimizeDataFiles` semantics
    (:108-140) per table: REPLACE-stop, then time OR count trigger."""
    return trigger.decide_optimize(io.snapshots(spark, sf_dir))


# ---------------------------------------------------------------------------
# A11/A12 — config map projections (:93-99; EMRSparkUtil.java:72-77,137-141)
# ---------------------------------------------------------------------------

# Deterministic per-user config map built from the fixture: event-type
# counts become config entries; 'purchase'/'view' map to reporter keys
# so the drop/prefix logic has something to bite on.
_CONF_KEY_SQL = """
  CASE event_type
    WHEN 'purchase' THEN 'optimize-data.impl'
    WHEN 'view' THEN 'metrics-reporter-impl'
    WHEN 'error' THEN 'optimize-data.spark.configs.spark.executor.memory'
    ELSE 'optimize-data.options.' || event_type
  END
"""

_CONF_CTE = f"""
  conf AS (
    SELECT user_id, {_CONF_KEY_SQL} AS conf_key, CAST(COUNT(*) AS VARCHAR) AS conf_value
    FROM events GROUP BY user_id, event_type
  )
"""


def _conf_entries(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = io.table(spark, sf_dir, "events")
    key = (
        F.when(F.col("event_type") == "purchase", F.lit("optimize-data.impl"))
        .when(F.col("event_type") == "view", F.lit("metrics-reporter-impl"))
        .when(
            F.col("event_type") == "error",
            F.lit("optimize-data.spark.configs.spark.executor.memory"),
        )
        .otherwise(F.concat(F.lit(config.OPTIONS_PREFIX), F.col("event_type")))
    )
    return ev.groupBy("user_id", "event_type").agg(F.count("*").alias("n")).select(
        "user_id", key.alias("conf_key"), F.col("n").cast("string").alias("conf_value")
    )


def _props_map(entries: DataFrame) -> DataFrame:
    """Collapse (user_id, k, v) rows into a MapType column — the
    `Map<String,String> properties` the reference passes around."""
    return entries.groupBy("user_id").agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("conf_key", "conf_value")))
        ).alias("props_map")
    )


_REPORTER_KEYS_SQL = ", ".join(f"'{k}'" for k in config.REPORTER_PROPERTIES)


@register(
    "config_drop_keys",
    tier="A",
    oracle=f"""
    WITH {_CONF_CTE}
    SELECT user_id,
           string_agg(conf_key || '=' || conf_value, ',' ORDER BY conf_key) AS remaining_entries
    FROM conf
    WHERE conf_key NOT IN ({_REPORTER_KEYS_SQL})
    GROUP BY user_id
    """,
)
def config_drop_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A11: `removeReporterProperties` (:93-99) — map_filter dropping the
    reporter keys so a spawned job can't re-trigger itself.  The map is
    rendered as a sorted `k=v,...` string for engine-neutral hashing."""
    dropped = F.map_filter(
        F.col("props_map"),
        lambda k, _: ~k.isin(*config.REPORTER_PROPERTIES),
    )
    return _props_map(_conf_entries(spark, sf_dir)).select(
        "user_id",
        F.array_join(
            F.array_sort(
                F.transform(
                    F.map_entries(dropped),
                    lambda e: F.concat(e["key"], F.lit("="), e["value"]),
                )
            ),
            ",",
        ).alias("remaining_entries"),
    )


@register(
    "config_prefix_select",
    tier="A",
    oracle=f"""
    WITH {_CONF_CTE}
    SELECT user_id,
           string_agg(substr(conf_key, {len(config.OPTIONS_PREFIX) + 1}) || '=' || conf_value,
                      ',' ORDER BY conf_key) AS option_entries
    FROM conf
    WHERE conf_key LIKE '{config.OPTIONS_PREFIX}%'
    GROUP BY user_id
    """,
)
def config_prefix_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A12: `PropertyUtil.propertiesWithPrefix` (EMRSparkUtil.java:72-77)
    — select the `optimize-data.options.` sub-map and strip the prefix."""
    plen = len(config.OPTIONS_PREFIX)
    selected = F.map_filter(
        F.col("props_map"), lambda k, _: k.startswith(config.OPTIONS_PREFIX)
    )
    rendered = F.array_join(
        F.array_sort(
            F.transform(
                F.map_entries(selected),
                lambda e: F.concat(e["key"].substr(F.lit(plen + 1), F.length(e["key"])), F.lit("="), e["value"]),
            )
        ),
        ",",
    )
    return (
        _props_map(_conf_entries(spark, sf_dir))
        .select("user_id", rendered.alias("option_entries"))
        .filter(F.col("option_entries") != "")
    )


# ---------------------------------------------------------------------------
# A14/A15 — SQL command rendering (EMRSparkUtil.java:101-128,136-162)
# ---------------------------------------------------------------------------


@register(
    "sql_command_render",
    tier="A",
    oracle=f"""
    WITH {_CONF_CTE},
    opts AS (
      SELECT user_id,
             string_agg('''' || substr(conf_key, {len(config.OPTIONS_PREFIX) + 1}) || ''',''' || conf_value || '''',
                        ',' ORDER BY conf_key) AS opt_body
      FROM conf
      WHERE conf_key LIKE '{config.OPTIONS_PREFIX}%'
      GROUP BY user_id
    )
    SELECT 't' || CAST(user_id AS VARCHAR) AS table_name,
           'CALL {config.CATALOG_NAME}.system.rewrite_data_files(table => ''t' || CAST(user_id AS VARCHAR)
             || ''', options => map(' || opt_body || '), strategy => ''binpack'')' AS sql_text
    FROM opts
    """,
)
def sql_command_render(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A14/A15: render `CALL aws_ebtm.system.rewrite_data_files(...)`
    with a sorted `map('k','v',...)` options literal
    (`buildSparkSqlOptimizeDataFilesCommand`, EMRSparkUtil.java:101-128;
    options rendering :136-162 — sorted here for determinism, an
    improvement over the reference's HashMap order)."""
    plen = len(config.OPTIONS_PREFIX)
    entries = _conf_entries(spark, sf_dir).filter(
        F.col("conf_key").startswith(config.OPTIONS_PREFIX)
    )
    quoted = F.concat(
        F.lit("'"),
        F.col("conf_key").substr(F.lit(plen + 1), F.length("conf_key")),
        F.lit("','"),
        F.col("conf_value"),
        F.lit("'"),
    )
    per_user = entries.select("user_id", F.col("conf_key"), quoted.alias("kv")).groupBy(
        "user_id"
    ).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("conf_key", "kv"))), lambda s: s["kv"]
            ),
            ",",
        ).alias("opt_body")
    )
    return per_user.select(
        F.concat(F.lit("t"), F.col("user_id").cast("string")).alias("table_name"),
        F.concat(
            F.lit(f"CALL {config.CATALOG_NAME}.system.rewrite_data_files(table => 't"),
            F.col("user_id").cast("string"),
            F.lit("', options => map("),
            F.col("opt_body"),
            F.lit("), strategy => 'binpack')"),
        ).alias("sql_text"),
    )


# ---------------------------------------------------------------------------
# A16 — spark-conf argv assembly (EMRSparkUtil.java:36-86,170-181)
# ---------------------------------------------------------------------------


@register(
    "conf_argv_explode",
    tier="A",
    oracle=f"""
    WITH {_CONF_CTE}
    SELECT user_id, '--conf ' || conf_key || '=' || conf_value AS conf_arg
    FROM conf
    WHERE conf_key LIKE '{config.SPARK_CONFIGS_PREFIX}%'
       OR conf_key LIKE '{config.OPTIONS_PREFIX}%'
    """,
)
def conf_argv_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A16: expand each config pair into a `--conf k=v` argv element
    (`buildSparkConfigurations`, EMRSparkUtil.java:71-86) — explode over
    map entries."""
    m = _props_map(_conf_entries(spark, sf_dir))
    exploded = m.select("user_id", F.explode(F.map_entries("props_map")).alias("e")).select(
        "user_id", F.col("e.key").alias("conf_key"), F.col("e.value").alias("conf_value")
    )
    return exploded.filter(
        F.col("conf_key").startswith(config.SPARK_CONFIGS_PREFIX)
        | F.col("conf_key").startswith(config.OPTIONS_PREFIX)
    ).select(
        "user_id",
        F.concat(F.lit("--conf "), F.col("conf_key"), F.lit("="), F.col("conf_value")).alias(
            "conf_arg"
        ),
    )
