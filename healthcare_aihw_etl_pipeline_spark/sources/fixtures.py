"""Reference-shaped ingest fixtures (FIXTURES.md §B) + generated oracle SQL.

Three synthetic raw sheets exercising every quirk of the reference's
parse path (/root/reference/main.py:48-131): junk preamble rows, unnamed
header cells, a droppable ``total`` helper column, tuple-artifact dirty
dims, junk numerics for coerce-casting, a null-first-id row, ragged rows,
heterogeneous dimension sets across sheets, and one invalid sheet.

All numeric cell values are binary-exact (integers and halves) so double
sums compare bit-identically between Spark and DuckDB without the
integer-cents detour.

`ingest_oracle_sql()` generates, from the same constants, a DuckDB query
that replays the post-header data semantics (F1 null-drop → X2 clean →
X3 coerce → R1 melt → U1 union-by-name → A1 fill-then-group), making the
whole ingest data path oracle-checkable; the header-inference prefix is
covered by unit tests instead (it is metadata, not data).
"""

from __future__ import annotations

# (rows, stamped_year) — year normally comes from the workbook URL
# (/root/reference/main.py:141-142).
SHEET1 = (
    [
        ["Admitted patient care 2021-22", None],
        [None, "some note"],
        ["", "", "Care type", "Total", "NSW", "VIC", "QLD", "SA", "WA", "TAS", "NT", "ACT", "AUST"],
        ['("Injury", 1.0)', "S00-T98", "Acute", "100", "10", "20", "n.p.", "5", " 7 ", "—", "1", "2", "45"],
        ["Mental health", None, "Acute", "50", "5", "n.p.", "8", "", "3", "2", "0", "1", "19"],
        [None, "X40", "Acute", "9", "1", "2", "3", "1", "1", "0", "0", "1", "9"],
        ['"Cancer"', "C00-D48", "Sub-acute", "30", "4", "6", "2", "3", "1", "0.5", "0", "2", "18.5"],
        ["Injury, 2.0", "S00-T98", "Acute", "", "2", "3", "4", "n/a", "1", "1", "0", "0", "11"],
    ],
    2022,
)

SHEET2 = (
    [
        ["Some title", None],
        ["", "Hospital type", "NSW", "VIC", "QLD"],
        ["Injury", "Public", "3", "4", "5"],
        ["Cancer", "Private", "x", "2", "1"],
        ["Mental health", "Public", "6", "", "2"],
    ],
    2023,
)

SHEET3_INVALID = (
    [
        ["no", "states", "here"],
        ["a", "b", "c"],
    ],
    2024,
)

SHEETS = [SHEET1, SHEET2, SHEET3_INVALID]

_S1_STATES = ["NSW", "VIC", "QLD", "SA", "WA", "TAS", "NT", "ACT", "AUST"]
_S2_STATES = ["NSW", "VIC", "QLD"]


def _sql_str(v: object) -> str:
    if v is None:
        return "NULL"
    return "'" + str(v).replace("'", "''") + "'"


def _sql_clean(expr: str) -> str:
    """DuckDB twin of functions.scalar.clean_text with the pandas
    null→'nan' parity applied (astype(str), /root/reference/main.py:60)."""
    cleaned = (
        "TRIM(TRIM(REGEXP_REPLACE(REGEXP_REPLACE(REGEXP_REPLACE("
        f"{expr}, '^\\(\"?\\s*', '', 'g'), '\"?\\)$', '', 'g'), "
        "',\\s*[-+]?[0-9]*\\.?[0-9]+$', '', 'g')), '\"')"
    )
    return f"COALESCE({cleaned}, 'nan')"


def _sql_num(expr: str) -> str:
    return f"TRY_CAST(TRIM({expr}) AS DOUBLE)"


def _values(rows: list[list[object]], width: int) -> str:
    padded = [list(r) + [None] * (width - len(r)) for r in rows]
    return ",\n      ".join(
        "(" + ", ".join(_sql_str(c) for c in r) + ")" for r in padded
    )


def ingest_oracle_sql() -> str:
    s1_cols = ["category", "principal_diagnosis", "care_type", "total", *_S1_STATES]
    s2_cols = ["category", "hospital_type", *_S2_STATES]
    s1_vals = _values(SHEET1[0][3:], len(s1_cols))
    s2_vals = _values(SHEET2[0][2:], len(s2_cols))

    s1_melt = "\n      UNION ALL ".join(
        f"SELECT category, principal_diagnosis, care_type, '{st}' AS state, "
        f'"{st}" AS separations FROM s1c WHERE "{st}" IS NOT NULL'
        for st in _S1_STATES
    )
    s2_melt = "\n      UNION ALL ".join(
        f"SELECT category, hospital_type, '{st}' AS state, "
        f'"{st}" AS separations FROM s2c WHERE "{st}" IS NOT NULL'
        for st in _S2_STATES
    )
    s1_quoted = ", ".join(f'"{c}"' for c in s1_cols)
    s2_quoted = ", ".join(f'"{c}"' for c in s2_cols)
    s1_states_clean = ", ".join(f'{_sql_num(f_q)} AS "{st}"' for st, f_q in zip(_S1_STATES, [f'"{s}"' for s in _S1_STATES]))
    s2_states_clean = ", ".join(f'{_sql_num(f_q)} AS "{st}"' for st, f_q in zip(_S2_STATES, [f'"{s}"' for s in _S2_STATES]))

    return f"""
    WITH s1({s1_quoted}) AS (VALUES
      {s1_vals}),
    s2({s2_quoted}) AS (VALUES
      {s2_vals}),
    s1c AS (
      SELECT {_sql_clean("category")} AS category,
             {_sql_clean("principal_diagnosis")} AS principal_diagnosis,
             {_sql_clean("care_type")} AS care_type,
             {s1_states_clean}
      FROM s1 WHERE category IS NOT NULL
    ),
    s2c AS (
      SELECT {_sql_clean("category")} AS category,
             {_sql_clean("hospital_type")} AS hospital_type,
             {s2_states_clean}
      FROM s2 WHERE category IS NOT NULL
    ),
    s1m AS (
      {s1_melt}
    ),
    s2m AS (
      {s2_melt}
    ),
    unioned AS (
      SELECT category, principal_diagnosis, care_type, CAST(NULL AS VARCHAR) AS hospital_type,
             state, separations, 2022 AS year FROM s1m
      UNION ALL
      SELECT category, NULL, NULL, hospital_type, state, separations, 2023 FROM s2m
    )
    SELECT year, state,
           COALESCE(category, '') AS category,
           COALESCE(principal_diagnosis, '') AS principal_diagnosis,
           COALESCE(care_type, '') AS care_type,
           COALESCE(hospital_type, '') AS hospital_type,
           SUM(separations) AS separations
    FROM unioned
    GROUP BY 1, 2, 3, 4, 5, 6
    """
