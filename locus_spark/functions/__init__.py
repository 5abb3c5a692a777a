"""Scalar-function surface of the engine (SURVEY.md §2.5).

Everything here is either a native pyspark Column expression (preferred —
stays inside whole-stage codegen) or a vectorized numpy kernel wrapped in an
Arrow pandas UDF. No per-row Python anywhere.
"""
