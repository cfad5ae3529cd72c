"""Structured-Streaming-native forms of the J-group operators.

The batch-checkable twins (what the oracle gates) live in
``operators.events``; this package proves the same query shapes run as
real streams (SURVEY.md §2 J1-J7 streaming-native column)."""
