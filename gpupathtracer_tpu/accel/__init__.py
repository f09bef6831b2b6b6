"""Acceleration structures: flattened stackless BVH (SURVEY.md §7.1 step 3)."""
