"""Operator library — SURVEY.md §2 parity plus pipeline extensions."""
