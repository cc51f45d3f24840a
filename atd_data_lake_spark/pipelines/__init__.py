"""Reference ETL chains re-expressed as pure DataFrame transforms.

Each reference entry point (bt/wt/gs × standardize/ready/publish,
SURVEY.md §3) becomes a function ``DataFrame → DataFrame``; the
file-at-a-time loops disappear — a whole date range processes as one
partitioned job, and the incremental skip-done-work logic is the
catalog anti-join in ``operators.incremental``.
"""
