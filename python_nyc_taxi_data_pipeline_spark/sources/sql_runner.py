"""Multi-statement .sql file runner (SURVEY §2.11 X4).

The reference executes whole SQL scripts through one cursor call
(`/root/reference/src/utils/database_connection.py:85-89`). Spark takes
one statement per ``spark.sql`` call, so we split on semicolons —
respecting string literals and line comments — and run the statements
in order, returning the last non-None DataFrame.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession


def split_sql_statements(text: str) -> list[str]:
    """Split SQL text on ';' outside quotes/comments."""
    statements: list[str] = []
    buf: list[str] = []
    in_squote = in_dquote = in_comment = False
    i = 0
    while i < len(text):
        ch = text[i]
        nxt = text[i + 1] if i + 1 < len(text) else ""
        if in_comment:
            if ch == "\n":
                in_comment = False
            buf.append(ch)
        elif in_squote:
            buf.append(ch)
            if ch == "'":
                if nxt == "'":  # escaped quote
                    buf.append(nxt)
                    i += 1
                else:
                    in_squote = False
        elif in_dquote:
            buf.append(ch)
            if ch == '"':
                in_dquote = False
        elif ch == "-" and nxt == "-":
            in_comment = True
            buf.append(ch)
        elif ch == "'":
            in_squote = True
            buf.append(ch)
        elif ch == '"':
            in_dquote = True
            buf.append(ch)
        elif ch == ";":
            stmt = "".join(buf).strip()
            if stmt:
                statements.append(stmt)
            buf = []
        else:
            buf.append(ch)
        i += 1
    tail = "".join(buf).strip()
    if tail:
        statements.append(tail)
    return statements


def run_sql_file(spark: SparkSession, path: str | Path) -> DataFrame | None:
    """Execute every statement in a .sql file; returns the result of the
    last statement (mirrors cursor.execute-the-whole-script, X4)."""
    last: DataFrame | None = None
    for stmt in split_sql_statements(Path(path).read_text()):
        last = spark.sql(stmt)
    return last
