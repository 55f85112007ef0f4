"""Operator kernels: each module documents the SURVEY.md §2 operator IDs it
implements and the reference citation it derives semantics from."""
