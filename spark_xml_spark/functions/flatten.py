"""Auto-flatten nested XML DataFrames into a relational view.

spark-xml reads produce deeply nested rows (repeated elements ->
ArrayType, child elements -> StructType, attributes -> ``_attr`` struct
fields); virtually every downstream consumer hand-writes the same
``select("a.b.c").withColumn(explode(...))`` chains. ``flatten_xml``
mechanizes that: structs are promoted to ``parent<sep>child`` columns
and arrays are exploded (outer, so empty/NULL arrays keep their parent
row), repeating until the schema is flat.

Scale shape: pure projections + ``explode_outer`` — narrow, whole-stage
codegen, no shuffle, no UDF. Each array explode multiplies rows exactly
like the hand-written query would; flattening N sibling arrays is the
relational cross product of their elements per parent row, which is the
only faithful flat representation (documented; pass ``arrays="first"``
to explode just the outermost arrays one level per call instead).

No reference counterpart (users compose this by hand over
XmlRelation's rows); provided as the idiomatic-DataFrame equivalent of
the community flatten recipes.
"""

from __future__ import annotations

from typing import List

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _flat_cols(schema: T.StructType, sep: str) -> List:
    """One promotion pass: struct fields -> prefixed columns; everything
    else passes through. Returns (columns, changed). Raises on an alias
    collision (e.g. existing column ``a_b`` next to struct ``a.b``) —
    silently emitting duplicate column names would break the first
    downstream select/write with an ambiguity error that doesn't point
    back here."""
    cols = []
    names: List[str] = []
    changed = False
    for f in schema.fields:
        if isinstance(f.dataType, T.StructType):
            changed = True
            for sub in f.dataType.fields:
                cols.append(
                    F.col(f"`{f.name}`.`{sub.name}`").alias(
                        f"{f.name}{sep}{sub.name}"
                    )
                )
                names.append(f"{f.name}{sep}{sub.name}")
        else:
            cols.append(F.col(f"`{f.name}`"))
            names.append(f.name)
    dupes = {n for n in names if names.count(n) > 1}
    if dupes:
        raise ValueError(
            f"flatten_xml alias collision on {sorted(dupes)}: a promoted "
            f"struct field clashes with an existing column; pass a "
            f"different sep"
        )
    return cols, changed


def flatten_xml(
    df: DataFrame,
    sep: str = "_",
    arrays: str = "all",
    max_depth: int = 32,
) -> DataFrame:
    """Flatten every StructType and ArrayType column of ``df``.

    ``arrays``: ``"all"`` (default) explodes arrays at every nesting
    level until none remain; ``"none"`` only promotes struct fields and
    leaves arrays as-is; ``"first"`` explodes EVERY array of the
    outermost level once, then continues flattening structs only
    (arrays surfaced from deeper levels stay arrays). ``explode_outer``
    keeps parents with empty/NULL arrays (their element columns become
    NULL) — the relational OUTER semantics a sink table wants.

    ``max_depth`` bounds ARRAY-NESTING depth (one iteration per level,
    however many sibling arrays the level holds); a deeper (adversarial)
    schema raises instead of looping. Struct promotion terminates on its
    own — each pass strictly reduces struct depth.
    """
    if arrays not in ("all", "none", "first"):
        raise ValueError("arrays must be 'all', 'none' or 'first'")
    exploded_once = False
    for _ in range(max_depth):
        # promote structs until none remain at this level, so
        # array-of-struct explosions surface their fields before the
        # next level's explode
        while True:
            cols, changed = _flat_cols(df.schema, sep)
            if not changed:
                break
            df = df.select(*cols)
        arrs = [
            f.name
            for f in df.schema.fields
            if isinstance(f.dataType, T.ArrayType)
        ]
        if not arrs or arrays == "none" or (
            arrays == "first" and exploded_once
        ):
            return df
        # one LEVEL: every current sibling array exploded exactly once
        # (sequential selects — Spark allows a single generator per
        # projection; sibling arrays produce the relational cross
        # product per parent row)
        for arr in arrs:
            df = df.select(
                *[
                    F.explode_outer(F.col(f"`{c}`")).alias(arr)
                    if c == arr
                    else F.col(f"`{c}`")
                    for c in df.columns
                ]
            )
        exploded_once = True
    raise ValueError(
        f"array nesting deeper than {max_depth} levels"
    )
