"""The ingest-policy transform chain (SURVEY §2.3 P3-P8).

The reference normalizes every inbound record batch with pandas before
landing it (``utils.py:40-89`` for the datalake write, ``utils.py:
118-144`` staging, ``utils.py:223-252`` curated):

1. ``pd.json_normalize`` — nested dict → dot-named flat columns
   (``utils.py:49,129,230``)                              → P4
2. drop all-NA columns ("NA columns get to be understood as strings
   until told otherwise", ``utils.py:58-62``)             → P8
3. string-first coercion: ``astype(str)``, fill ``''``, truncate to
   10,000 chars, scrub literal ``'nan'``/``'None'``
   (``utils.py:192-201``)                                 → P5
4. sanitize column names to catalog-safe identifiers
   (``wr.catalog.sanitize_dataframe_columns_names``,
   ``utils.py:68,205``)                                   → P6
5. drop duplicated column names, keep-first
   (``wr.catalog.drop_duplicated_columns``, ``utils.py:69,206``) → P7

Here each step is a declarative projection so the whole chain fuses
into ONE Catalyst ``Project`` (plus one aggregate pass for the NA-drop)
and runs inside whole-stage codegen — no Python in the per-row path.
Distribution note (SURVEY §7 "what's hard"): the all-NA drop is a
*global* aggregate in Spark, where pandas saw only its batch; we define
batch-global (one aggregate over the whole ingest batch) as the
engine's semantics.

The Glue-side type whitelist (``src/glue/staging_to_curated.py:
158-161``) is ``sanitize_types_for_catalog`` — non-whitelisted Catalyst
types degrade to string before a table write.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MAX_STRING_LEN = 10_000  # utils.py:196 truncation cap

# src/glue/staging_to_curated.py:158-161 — types allowed to reach the
# catalog; anything else degrades to string.
CATALOG_TYPE_WHITELIST = frozenset(
    {
        "int",
        "bigint",
        "integer",
        "boolean",
        "tinyint",
        "smallint",
        "double",
        "float",
        "char",
        "decimal",
        "varchar",
        "string",
        "binary",
        "date",
        "timestamp",
    }
)


def _positional(df: DataFrame) -> tuple[DataFrame, list[str]]:
    """Rename to unique positional temp names so no step resolves a
    column by its user-supplied name. Spark resolution is
    case-INsensitive by default, so records like ``{'A':…,'a':…}``
    (legal JSON, distinct pandas columns) make ``F.col('A')``
    ambiguous; ``toDF`` renames positionally and sidesteps that."""
    orig = df.columns
    return df.toDF(*[f"__c{i}" for i in range(len(orig))]), orig


def flatten_structs(df: DataFrame, sep: str = "_") -> DataFrame:
    """P4 — recursively flatten StructType columns to ``parent_child``.

    Mirrors ``pd.json_normalize`` (``utils.py:49``): nested objects
    flatten, arrays do NOT explode (json_normalize leaves lists as
    object values; the string-first cast later stringifies them).
    Pure projection — zero shuffle, survives any scale.
    """
    while True:
        if not any(isinstance(f.dataType, T.StructType) for f in df.schema.fields):
            return df
        renamed, orig = _positional(df)
        sel: list[str] = []
        out_names: list[str] = []
        for f, name in zip(renamed.schema.fields, orig):
            if isinstance(f.dataType, T.StructType):
                # star-expand (positional) rather than field-by-name:
                # struct fields can themselves be case-duplicates
                # ({'A':…,'a':…}), where `.getField('A')` is ambiguous.
                sel.append(f"{f.name}.*")
                out_names.extend(f"{name}{sep}{sub.name}" for sub in f.dataType.fields)
            else:
                sel.append(f.name)
                out_names.append(name)
        df = renamed.select(*sel).toDF(*out_names)


def drop_all_null_columns(df: DataFrame, na_drop: str = "all") -> DataFrame:
    """P8 — drop NA columns in one aggregate pass (``utils.py:57-62``).

    ``na_drop`` pins which semantics (INTENT DECISION, SURVEY §0.1):

    * ``"all"`` (engine default) — drop columns with ZERO non-null
      values. A column that is null for every row of the batch carries
      no information; one stray null should not delete real data.
    * ``"any"`` — the reference's literal behavior
      (``df.isna().any()``, ``utils.py:57-62``): drop columns with AT
      LEAST ONE null. Provided for bug-compatible parity runs.

    One aggregate pass (partial counts map-side, tiny final reduce) —
    the only action in the chain; at 100 TB it is a single
    column-pruned scan producing one row.
    """
    if na_drop not in ("all", "any"):
        raise ValueError(f"na_drop must be 'all' or 'any', got {na_drop!r}")
    if not df.columns:
        return df
    renamed, orig = _positional(df)
    tmp = renamed.columns
    counts = renamed.agg(
        F.count(F.lit(1)).alias("__n"),
        *[F.count(F.col(t)).alias(str(i)) for i, t in enumerate(tmp)],
    ).collect()[0]
    if na_drop == "all":
        survives = lambda i: counts[str(i)] > 0
    else:  # "any": keep only columns with no nulls at all
        survives = lambda i: counts[str(i)] == counts["__n"]
    keep = [
        F.col(t).alias(o)
        for i, (t, o) in enumerate(zip(tmp, orig))
        if survives(i)
    ]
    if len(keep) == len(orig):
        return df
    return renamed.select(*keep)


def stringify_columns(df: DataFrame, max_len: int = MAX_STRING_LEN) -> DataFrame:
    """P5 — string-first coercion (``utils.py:192-201``).

    cast→string, nulls and literal 'nan'/'None' → '', truncate to
    ``max_len``. Non-atomic types (arrays/maps left by P4) stringify
    via ``to_json`` so the value survives round-trips.
    """
    renamed, orig = _positional(df)
    cols = []
    for f, name in zip(renamed.schema.fields, orig):
        c = F.col(f.name)
        if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType)):
            s = F.to_json(c)
        else:
            s = c.cast("string")
        s = F.coalesce(s, F.lit(""))
        s = F.when(s.isin("nan", "None", "NaN"), F.lit("")).otherwise(s)
        cols.append(F.substring(s, 1, max_len).alias(name))
    return renamed.select(*cols)


def sanitize_column_names(df: DataFrame) -> DataFrame:
    """P6 — catalog-safe names (``utils.py:68,205``): lowercase,
    non-alphanumerics → ``_``, leading digit prefixed."""
    return df.toDF(*[_sanitize_name(c) for c in df.columns])


def _sanitize_name(name: str) -> str:
    out = re.sub(r"\W", "_", name.strip().lower())
    if out and out[0].isdigit():
        out = "_" + out
    return out or "_"


def drop_duplicate_columns(df: DataFrame) -> DataFrame:
    """P7 — keep-first on duplicated names (``utils.py:69,206``).

    Positional rename to unique temp names sidesteps the ambiguity of
    selecting a duplicated name, then keep-first restores originals.
    """
    cols = df.columns
    if len(set(cols)) == len(cols):
        return df
    tmp = [f"__c{i}" for i in range(len(cols))]
    renamed = df.toDF(*tmp)
    seen: set[str] = set()
    keep = []
    for i, c in enumerate(cols):
        if c not in seen:
            seen.add(c)
            keep.append(F.col(tmp[i]).alias(c))
    return renamed.select(*keep)


def sanitize_types_for_catalog(df: DataFrame) -> DataFrame:
    """K8's whitelist (``src/glue/staging_to_curated.py:158-161``) —
    degrade non-whitelisted top-level types to string before a table
    write. Decimal keeps its precision (whitelisted as a family)."""
    renamed, orig = _positional(df)
    cols = []
    for f, name in zip(renamed.schema.fields, orig):
        tname = f.dataType.typeName()
        if tname.startswith("decimal"):
            tname = "decimal"
        if tname in CATALOG_TYPE_WHITELIST or tname in {"long", "short", "byte"}:
            cols.append(F.col(f.name).alias(name))
        elif isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType)):
            cols.append(F.to_json(F.col(f.name)).alias(name))
        else:
            cols.append(F.col(f.name).cast("string").alias(name))
    return renamed.select(*cols)


def apply_ingest_policy(
    df: DataFrame,
    *,
    stringify: bool = True,
    max_len: int = MAX_STRING_LEN,
    na_drop: str = "all",
) -> DataFrame:
    """The full P4→P8→P5→P6→P7 chain in the reference's order
    (``utils.py:40-89``: normalize 49, NA-drop 58-62, astype(str)
    64-66, sanitize 68, dedup-columns 69).

    With ``stringify=False`` the chain keeps inferred types (the Glue
    job's mode, ``src/glue/staging_to_curated.py:61-70``) and only
    flattens/sanitizes — the curated path then applies the catalog
    type whitelist instead. ``na_drop`` selects the NA-column-drop
    semantics (see ``drop_all_null_columns``; "all" is the engine
    default, "any" is reference-literal).
    """
    df = flatten_structs(df)
    df = drop_all_null_columns(df, na_drop=na_drop)
    if stringify:
        df = stringify_columns(df, max_len=max_len)
    df = sanitize_column_names(df)
    df = drop_duplicate_columns(df)
    return df


def variant_fields(
    df: DataFrame,
    json_col: str,
    fields: dict[str, tuple[str, str]],
    keep: list[str] | None = None,
    variant_out: str | None = None,
) -> DataFrame:
    """Semi-structured ingest on Spark 4 VARIANT (round 12) — the
    modern form of the reference's dynamic-JSON chain
    (``utils.py:40-66`` json_normalize → string-first columns): parse
    each JSON record ONCE into a binary VARIANT and project typed
    fields lazily with ``try_variant_get``, instead of flattening
    every key into a column up front. Missing paths and type
    mismatches yield NULL (the try_ discipline — one poisoned record
    must not fail the batch, the incremental-curate rule).

    ``fields`` maps output column → (JSONPath, Spark type). ``keep``
    carries passthrough columns; ``variant_out`` optionally keeps the
    parsed VARIANT for downstream ad-hoc paths. At 100 TB the win is
    the SHREDDED scan: one parse, column-pruned typed extraction,
    no per-key string re-parse, no schema-explosion of rare keys."""
    v = F.try_parse_json(F.col(json_col))
    cols = [F.col(c) for c in (keep or [])]
    if variant_out:
        cols.append(v.alias(variant_out))
    cols += [
        F.try_variant_get(v, path, typ).alias(out)
        for out, (path, typ) in fields.items()
    ]
    return df.select(*cols)
