"""Schema / data validation — the reference's SparkValidationNode
(``infra/compute_engines/spark/nodes.py:623-724``): missing-column check,
type-compatibility check, JSON well-formedness sampling (first 1000 rows).

Spark-first twist: the JSON check runs as a distributed filter count
(``from_json(col).isNull()`` over a LIMIT sample) instead of collecting
rows to the driver.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Spark simpleString() names and common aliases normalize to one canonical
# form, so callers may declare either 'long' or 'bigint' etc.
_ALIASES = {
    "bigint": "long", "integer": "int", "smallint": "short",
    "tinyint": "byte", "string": "string", "varchar": "string",
    "real": "float", "timestamp_ntz": "timestamp",
}


def _canon_type(name: str) -> str:
    name = name.strip().lower()
    return _ALIASES.get(name, name)


# widening conversions considered compatible (nodes.py:676-690 analogue),
# keyed by canonical names
_COMPATIBLE: dict[str, set[str]] = {
    "long": {"byte", "short", "int", "long"},
    "int": {"byte", "short", "int"},
    "double": {"byte", "short", "int", "long", "float", "double"},
    "float": {"byte", "short", "int", "float"},
    "string": {"string"},
    "timestamp": {"timestamp"},
}


@dataclass
class ValidationResult:
    ok: bool
    missing_columns: list[str] = field(default_factory=list)
    type_mismatches: list[tuple[str, str, str]] = field(default_factory=list)
    invalid_json_count: int = 0

    def raise_on_error(self) -> None:
        if not self.ok:
            raise ValueError(
                f"validation failed: missing={self.missing_columns} "
                f"type_mismatches={self.type_mismatches} "
                f"invalid_json={self.invalid_json_count}"
            )


def validate_schema(
    df: DataFrame,
    expected: dict[str, str],
    json_columns: dict[str, str] | None = None,
    sample_rows: int = 1000,
) -> ValidationResult:
    """expected: {column: spark type simple-name}. json_columns:
    {column: schema ddl} checked for parseability on a sample."""
    actual = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    missing = [c for c in expected if c not in actual]
    mismatches = []
    for c, want_raw in expected.items():
        if c in actual:
            want = _canon_type(want_raw)
            have = _canon_type(actual[c])
            if have != want and have not in _COMPATIBLE.get(want, {want}):
                mismatches.append((c, want_raw, actual[c]))

    bad_json = 0
    if json_columns and not missing:
        sample = df.limit(sample_rows)
        # get_json_object(col, '$') is NULL iff the document doesn't parse
        # (PERMISSIVE from_json would return an all-null struct instead)
        checks = [
            F.sum(
                (
                    F.col(c).isNotNull()
                    & F.get_json_object(F.col(c), "$").isNull()
                ).cast("long")
            ).alias(c)
            for c, ddl in json_columns.items()
        ]
        row = sample.agg(*checks).first()
        bad_json = int(sum(row[c] or 0 for c in json_columns))

    ok = not missing and not mismatches and bad_json == 0
    return ValidationResult(ok, missing, mismatches, bad_json)
