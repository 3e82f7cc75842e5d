"""Pipeline plans: the reference's Airflow DAGs re-expressed as pure
DataFrame dataflow — the lineage graph *is* the DAG (SURVEY.md §3)."""
