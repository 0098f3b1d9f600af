"""Python user-defined table functions (SURVEY.md §2.B "UDF/UDAF/UDTF"
row — the reference has none; DuckDB builtins only, icerunner.py:200-207.
This is the table-function extension surface a Spark engine adds).

A UDTF turns one input row into N output rows inside the executor —
the lateral-join shape (`FROM t, LATERAL fn(t.col)`). Scale contract:
UDTFs run per-partition in the Python worker, rows stream through Arrow
batches, nothing is collected to the driver; the expansion factor (not
the input size) is what must fit per task. For pure splitting like this,
`explode(split(...))` is the faster JVM-native spelling — the UDTF form
exists for logic a SQL expression can't state (stateful per-row parsing,
external tokenizers); the test pins both spellings to identical output.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.functions import udtf


@udtf(returnType="pos: bigint, token: string", useArrow=True)
class SplitTokens:
    """Emit (position, token) per whitespace token of ``text``.

    Single-space split (Python ``str.split(" ")``) so the DuckDB oracle's
    ``string_split(text, ' ')`` is bit-identical, empties included.
    """

    def eval(self, text: str | None):  # noqa: D102 — UDTF contract method
        if text is None:
            return
        for i, tok in enumerate(text.split(" ")):
            yield i, tok


def register_udtfs(spark: SparkSession) -> None:
    """Register all engine UDTFs on the session (idempotent)."""
    spark.udtf.register("split_tokens", SplitTokens)
