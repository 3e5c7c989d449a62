"""Pipeline orchestration: staged execution, checkpoint/resume,
lineage + metrics."""
