"""Custom operators Spark lacks natively, composed Spark-first.

Each operator is a ``df -> df`` callable built from DataFrame primitives
(per the build rule: composition of built-ins first, Pandas-UDF only where
built-ins can't express the semantics, mapPartitions never needed so far).
"""
