"""Structured Streaming tier: the reference's daily incremental loads as
file-source streams (SURVEY.md §2.11)."""
