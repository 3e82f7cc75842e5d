"""Sources & sinks (SURVEY.md §2.1): schema-declared readers, idempotent
partitioned writers, multimodal binary columns."""
