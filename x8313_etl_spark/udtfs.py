"""Module-scope Python UDTF classes (SURVEY.md §2.11 X12) — executors
unpickle UDTFs by module path, so like python_ds.py these must not be
closures inside query functions."""

from __future__ import annotations

from pyspark.sql.functions import udtf
from pyspark.sql.types import StringType, StructField, StructType
from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult


@udtf
class FirstKTokens:
    """Widen a text's first k whitespace tokens into k columns; the
    schema is derived at ANALYZE time from the constant k argument
    (polymorphic output — x12_polymorphic_udtf's subject)."""

    @staticmethod
    def analyze(text: AnalyzeArgument, k: AnalyzeArgument) -> AnalyzeResult:
        n = int(k.value)
        return AnalyzeResult(
            StructType(
                [StructField(f"tok{i}", StringType()) for i in range(n)]
            )
        )

    def eval(self, text, k):
        toks = (text or "").split(" ")
        yield tuple((toks + [None] * k)[:k])
