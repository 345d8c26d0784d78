"""Scalar/relational function layer.

Towhee ships no built-in string/math/array function library — users pass
lambdas (SURVEY.md §2.3); this package replaces that gap with native
`pyspark.sql.functions` compositions (JVM-side, codegen) plus the
training-data-pipeline operators a 100 TB corpus needs: text analysis,
deduplication, and similarity search.
"""
