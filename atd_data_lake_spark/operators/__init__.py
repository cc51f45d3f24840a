"""Reusable DataFrame-level operators (SURVEY.md §2).

Each module implements one family from the operator inventory; all are
pure DataFrame → DataFrame functions designed for cluster-scale
execution (broadcast small sides, no driver-side row loops).
"""
