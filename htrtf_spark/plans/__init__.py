"""Job-level plans: extraction pipeline, salted ordering, checkpoint/resume."""
