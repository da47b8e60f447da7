"""Pipeline plans: end-to-end linkage lifecycles (SURVEY.md §3 analogs)."""
