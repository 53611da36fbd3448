"""Runnable end-to-end demos of the workbench/harness stack."""
