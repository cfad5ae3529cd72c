"""Scalar / higher-order function library (SURVEY.md §2 H and K6-K7).

Everything here is a Catalyst Column expression — JVM-side, codegen-able,
visible to the optimizer (pushdown, pruning). No Python UDFs in this
package; the Arrow fast paths live in ``operators``.
"""
