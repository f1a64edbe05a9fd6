"""Entity directory: entities, entity types, distinguished names, aliases.

Reference semantics (`/root/reference/src/minerva/directory/`):

- An **entity** is ``(id, created, name, entity_type_id)``; one dimension
  table per entity type (`entity.py:4-31`, `helpers.py:44-62`).
- **Name→id resolution is create-on-miss**: looking up a batch of names
  inserts the unknown ones (`helpers.py:24-93`).
- **Distinguished names** ``a=x,b=y`` map to entities; the entity type is
  the *last* component's key (`distinguishedname.py:12-56`).

Spark-first design decision (SURVEY §7 hard part (a)): the reference
mints serial ids inside one PostgreSQL transaction; a distributed
engine cannot cheaply serialize id allocation, so entity ids here are
**deterministic 64-bit content hashes** of (entity_type, name) —
xxhash64, stable across executors, loads, and reruns; no coordination,
no read-modify-write race, idempotent under parallel loads.  The
dimension table is still maintained (append-on-miss) so joins and
reverse lookups work, but correctness never depends on it being
up-to-date.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def entity_id_col(
    entity_type: str, name_col: str = "name", method: str = "xxhash64"
) -> F.Column:
    """Deterministic entity id of (type, name).

    ``xxhash64`` (default): fastest, JVM-side — the production choice.
    ``md5``: 60-bit md5-derived id, reproducible in any engine (used by
    oracle-checked queries; same id distribution properties).
    """
    key = F.concat_ws("\x1f", F.lit(entity_type), F.col(name_col))
    if method == "xxhash64":
        return F.xxhash64(key)
    if method == "md5":
        return F.conv(F.substring(F.md5(key), 1, 15), 16, 10).cast("bigint")
    raise ValueError(f"unknown id method: {method}")


def entity_id_duck_sql(entity_type: str, name_expr: str) -> str:
    """DuckDB twin of the md5 id method."""
    return (
        f"CAST(('0x' || substr(md5('{entity_type}' || chr(31) || {name_expr}),"
        f" 1, 15)) AS BIGINT)"
    )


def names_to_entity_ids(
    df: DataFrame, entity_type: str, name_col: str = "name",
    method: str = "xxhash64",
) -> DataFrame:
    """J2 lookup: attach ``entity_id`` for a name column.  Pure
    projection — no join, no shuffle (the payoff of hash ids)."""
    return df.withColumn("entity_id", entity_id_col(entity_type, name_col, method))


def register_entities(
    spark: SparkSession,
    dim_path: str,
    names: DataFrame,
    entity_type: str,
    name_col: str = "name",
    method: str = "xxhash64",
) -> DataFrame:
    """Create-on-miss into the dimension table (J2/J9 anti-insert):
    append rows for names not yet present; returns the new dimension.

    The dim table is small relative to facts (one row per monitored
    object) — the anti-join broadcasts it.
    """
    incoming = (
        names.select(F.col(name_col).alias("name"))
        .distinct()
        .withColumn("id", entity_id_col(entity_type, "name", method))
        .withColumn("entity_type", F.lit(entity_type))
        .withColumn("created", F.current_timestamp().cast("timestamp_ntz"))
    )
    from minerva_etl_spark.fsutil import parquet_exists as path_exists

    if path_exists(spark, dim_path):
        existing = spark.read.parquet(dim_path)
        fresh = incoming.join(
            existing.select("id").distinct(), "id", "left_anti"
        )
    else:
        fresh = incoming
    fresh.write.mode("append").parquet(dim_path)
    return spark.read.parquet(dim_path)


# ------------------------------------------------------------------ aliases
def aliases_to_entity_ids(
    df: DataFrame,
    alias_table: DataFrame,
    alias_col: str = "alias",
    alias_type: str | None = None,
) -> DataFrame:
    """J2 alias variant (`alias_directory.aliases_to_entity_ids`,
    `directory/helpers.py:15-21`): resolve entity ids through an alias
    table ``(alias, entity_id [, type])`` instead of primary names.
    The alias table is a dimension → broadcast; unknown aliases keep
    null entity_id (caller decides create-or-drop)."""
    at = alias_table
    if alias_type is not None and "type" in at.columns:
        at = at.filter(F.col("type") == alias_type)
    at = F.broadcast(
        at.select(F.col("alias").alias("__alias"), "entity_id")
    )
    return df.join(
        at, df[alias_col] == F.col("__alias"), "left"
    ).drop("__alias")


# ------------------------------------------------------- distinguished names
def dn_split_expr(dn_col: str) -> F.Column:
    """DN → array of 'k=v' parts (reference ``explode``,
    `distinguishedname.py:12-22`)."""
    return F.split(F.col(dn_col), ",")


def dn_split_parts_expr(dn_col: str) -> F.Column:
    """DN → parts, honoring backslash-escaped commas inside values
    (reference ``split_parts``, `distinguishedname.py:23-27`: split on
    ``(?<!\\\\),``).  ``Writer=qwerty\\,dvorak`` stays one part."""
    return F.split(F.col(dn_col), r"(?<!\\),")


def dn_escape_expr(col: "F.Column | str") -> F.Column:
    """Escape reserved characters in a name part (reference ``escape``,
    `distinguishedname.py:30-34`: ``,`` → ``\\,``) — literal replace,
    no regex."""
    c = F.col(col) if isinstance(col, str) else col
    return F.replace(c, F.lit(","), F.lit("\\,"))


def dn_entity_type_expr(dn_col: str) -> F.Column:
    """Entity type of a DN = key of the last component
    (`distinguishedname.py:44-56`)."""
    return F.regexp_extract(F.col(dn_col), r"([^,=]+)=([^,]+)$", 1)


def dn_entity_name_expr(dn_col: str) -> F.Column:
    return F.regexp_extract(F.col(dn_col), r"([^,=]+)=([^,]+)$", 2)


def dn_implode(*pairs: tuple[str, "F.Column | str"]) -> F.Column:
    """Build a DN string from (key, value-column) pairs — the inverse of
    the parse helpers (`distinguishedname.py:24-34` implode)."""
    parts = []
    for key, value in pairs:
        col = F.col(value) if isinstance(value, str) else value
        parts.append(F.concat(F.lit(f"{key}="), col))
    return F.concat_ws(",", *parts)


def dn_to_parts(df: DataFrame, dn_col: str = "dn") -> DataFrame:
    """Explode a DN column into (position, key, value) rows."""
    parts = F.posexplode(dn_split_expr(dn_col))
    return df.select(
        F.col(dn_col), parts.alias("pos", "part")
    ).select(
        dn_col,
        "pos",
        F.regexp_extract("part", r"^([^=]+)=", 1).alias("key"),
        F.regexp_extract("part", r"=(.*)$", 1).alias("value"),
    )
