"""Operator modules. Importing a module registers its queries in
``cloudvectordb_spark.registry`` (one named entry + oracle SQL twin per
SURVEY.md §2 operator)."""
